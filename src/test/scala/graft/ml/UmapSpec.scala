package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gate for [[UmapLayout]] — the force-directed phase: scalar-kernel
  * goldens, local-vs-distributed bit-equality (both inits), layout
  * quality on the XOR-caps manifold (clusters contract, separation
  * grows), determinism, and contract errors. */
class UmapSpec extends SparkTestBase {

  import spark.implicits._

  private def jit(i: Int, axis: Int): Double = {
    val h = (i.toLong * 2654435761L + axis.toLong * 0x9e3779b97f4a7c15L)
    (((h >>> 16) & 0xffff).toDouble / 65535.0 - 0.5) * 0.3
  }

  /** The SpectralSpec XOR-caps fixture: 4 tight antipodal caps, cosine
    * kNN at k = perCap−1 makes each an exact clique. */
  private def caps(perCap: Int): Seq[(Long, Seq[Float], Int)] =
    (0 until 4 * perCap).map { i =>
      val cap = i / perCap
      val (dx, dy, dz) = cap match {
        case 0 => (1.0, 0.0, 0.0)
        case 1 => (-1.0, 0.0, 0.0)
        case 2 => (0.0, 1.0, 0.0)
        case _ => (0.0, -1.0, 0.0)
      }
      val (x, y, z) = (dx + jit(i, 0), dy + jit(i, 1), dz + jit(i, 2))
      val n = math.sqrt(x * x + y * y + z * z)
      (i.toLong, Seq((x / n).toFloat, (y / n).toFloat, (z / n).toFloat), cap)
    }

  // ---- scalar kernels ----------------------------------------------------

  test("attractive term: pulls toward the neighbor, Cauchy-damped, clipped") {
    // dx > 0 means i sits to the RIGHT of j: force must be negative
    assert(UmapLayout.attLocal(1000000L, 1000000L * 1000000L) < 0)
    assert(UmapLayout.attLocal(-1000000L, 1000000L * 1000000L) > 0)
    // at d² = 1 unit² the coefficient is −2/(1+1) = −1: term = −dx exactly
    val dx = 700000L
    assert(UmapLayout.attLocal(dx, 1000000000000L) == -dx)
    // zero displacement → zero force
    assert(UmapLayout.attLocal(0L, 0L) == 0L)
    // the clip bound: 4 layout units
    assert(math.abs(UmapLayout.attLocal(UmapLayout.Quant, 0L)) <= UmapLayout.Clip)
  }

  test("repulsive term: pushes apart, strongest near contact, clipped at 4") {
    assert(UmapLayout.repLocal(1000L, 1000L * 1000L) > 0)
    assert(UmapLayout.repLocal(-1000L, 1000L * 1000L) < 0)
    // near-contact repulsion saturates at the clip (umap-learn's clip(4))
    assert(UmapLayout.repLocal(31623L, 31623L * 31623L * 2) == UmapLayout.Clip)
    // far apart the repulsion vanishes
    assert(math.abs(UmapLayout.repLocal(20L * 1000000L,
      (20L * 1000000L) * (20L * 1000000L))) < 1000L)
    assert(UmapLayout.repLocal(0L, 0L) == 0L)
  }

  test("learning-rate schedule: first epoch full step, decay to 1/T") {
    assert(UmapLayout.stepLocal(0L, 1000L, 0, 10) == 1000L)
    assert(UmapLayout.stepLocal(0L, 1000L, 9, 10) == 100L)
    // coordinate cap binds
    assert(UmapLayout.stepLocal(UmapLayout.CoordCap, UmapLayout.Clip, 0, 10)
      == UmapLayout.CoordCap)
  }

  // ---- bit-equality local vs distributed ---------------------------------

  test("distributed epochs equal the driver-local solve bit-for-bit (random init)") {
    val df = caps(8).map(t => (t._1, t._2)).toDF("id", "vec")
    val local = UmapLayout.embed(df, "id", "vec", k = 7, iters = 5,
      negatives = 3, init = "random").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val edges = Spectral.knnEdges(df, "id", "vec", 7)
    val dist = UmapLayout.embedFromEdges(edges,
        df.select(col("id")), iters = 5, negatives = 3, init = "random",
        localSolveMaxNodes = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(local.toSeq == dist.toSeq)
  }

  test("distributed epochs equal the local solve with spectral init too") {
    val df = caps(8).map(t => (t._1, t._2)).toDF("id", "vec")
    val local = UmapLayout.embed(df, "id", "vec", k = 7, iters = 4,
      negatives = 2, init = "spectral").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val edges = Spectral.knnEdges(df, "id", "vec", 7)
    val dist = UmapLayout.embedFromEdges(edges,
        df.select(col("id")), iters = 4, negatives = 2, init = "spectral",
        localSolveMaxNodes = 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(local.toSeq == dist.toSeq)
  }

  test("layout is independent of input partitioning and row order") {
    val rows = caps(8).map(t => (t._1, t._2))
    val a = UmapLayout.embed(rows.toDF("id", "vec"), "id", "vec",
      k = 7, iters = 3, init = "random").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val b = UmapLayout.embed(
      rows.reverse.toDF("id", "vec").repartition(16), "id", "vec",
      k = 7, iters = 3, init = "random").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  // ---- layout quality -----------------------------------------------------

  /** Mean within-cap and across-cap pairwise distances of a layout. */
  private def spread(emb: Array[(Long, Double, Double)], perCap: Int)
      : (Double, Double) = {
    val byCap = emb.groupBy(t => t._1 / perCap)
    def d(a: (Long, Double, Double), b: (Long, Double, Double)) =
      math.sqrt((a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3))
    val within = for {
      (_, g) <- byCap.toSeq; i <- g.indices; j <- i + 1 until g.length
    } yield d(g(i), g(j))
    val centroids = byCap.map { case (c, g) =>
      c -> ((g.map(_._2).sum / g.length, g.map(_._3).sum / g.length))
    }
    val across = for {
      (c1, (x1, y1)) <- centroids.toSeq; (c2, (x2, y2)) <- centroids
      if c1 < c2
    } yield math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2))
    (within.sum / within.length, across.sum / across.length)
  }

  test("XOR caps: the optimization contracts clusters and keeps them apart") {
    val perCap = 10
    val df = caps(perCap).map(t => (t._1, t._2)).toDF("id", "vec")
    // random init: no manifold structure at epoch 0 — the layout phase
    // itself must discover it (this is the claim the stand-ins couldn't
    // make: PCA/spectral are INITS; this is the optimizer)
    val before = UmapLayout.embed(df, "id", "vec", k = perCap - 1,
      iters = 1, negatives = 4, init = "random").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val after = UmapLayout.embed(df, "id", "vec", k = perCap - 1,
      iters = 60, negatives = 4, init = "random").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (w0, a0) = spread(before, perCap)
    val (w1, a1) = spread(after, perCap)
    // clusters contract by a lot; centroid separation survives repulsion
    assert(w1 < w0 / 4,
      s"within-cap spread should contract ≥4×: $w0 → $w1")
    assert(a1 > w1 * 4,
      s"caps should stay separated: across $a1 vs within $w1")
  }

  test("negatives=0 is pure attraction: everything contracts monotonically") {
    val df = caps(6).map(t => (t._1, t._2)).toDF("id", "vec")
    val emb = UmapLayout.embed(df, "id", "vec", k = 5, iters = 40,
      negatives = 0, init = "random").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (w, _) = spread(emb, 6)
    assert(w < 0.5, s"pure attraction should collapse caps, within = $w")
  }

  // ---- contract ------------------------------------------------------------

  test("contract errors: bad init, bad iters, too few nodes") {
    val df = caps(4).map(t => (t._1, t._2)).toDF("id", "vec")
    intercept[IllegalArgumentException](
      UmapLayout.embed(df, "id", "vec", init = "pca"))
    intercept[IllegalArgumentException](
      UmapLayout.embed(df, "id", "vec", iters = 0))
    intercept[IllegalArgumentException](
      UmapLayout.embed(df.limit(1), "id", "vec"))
  }
}
