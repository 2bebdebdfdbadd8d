package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gate for [[Spectral]] — the manifold case a LINEAR method cannot solve.
  *
  * Fixture: "XOR caps" on the sphere. Class A = two tight antipodal caps
  * around +u and −u; class B = two caps around +w and −w (u ⊥ w). No
  * linear functional separates A from B (both class means are ≈ 0 — any
  * projection has each class straddling zero), so the engine's own exact
  * nearest-centroid probe on the RAW vectors is at chance. The cosine kNN
  * graph, however, splits into four tight components, and the Laplacian
  * eigenmap places each cap at its own (e1, e2) location — leave-one-out
  * 1-NN in the embedded plane classifies perfectly. (Concentric RINGS are
  * deliberately not the fixture: cosine is scale-invariant, so rings
  * collapse onto each other — the caps construction is the honest
  * "PCA/linear can't" case in cosine geometry.)
  */
class SpectralSpec extends SparkTestBase {

  import spark.implicits._

  /** Deterministic jitter in [−0.15, 0.15] — hash-mix of (index, axis), no
    * RNG: the fixture is bit-replayable. */
  private def jit(i: Int, axis: Int): Double = {
    val h = (i.toLong * 2654435761L + axis.toLong * 0x9e3779b97f4a7c15L)
    (((h >>> 16) & 0xffff).toDouble / 65535.0 - 0.5) * 0.3
  }

  /** 4 caps × perCap points: (id, unit vector, class). Caps 0/1 → class A
    * (±x axis), caps 2/3 → class B (±y axis). */
  private def caps(perCap: Int): Seq[(Long, Seq[Float], String)] =
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
      (i.toLong, Seq((x / n).toFloat, (y / n).toFloat, (z / n).toFloat),
        if (cap < 2) "A" else "B")
    }

  test("XOR caps: exact linear probe is at chance on raw vectors") {
    val df = caps(10).toDF("id", "vec", "cls")
    val fit = Multiclass.fitCentroidsExact(df, col("vec"), col("cls"))
    val acc = Multiclass.predictExact(df, col("id"), col("vec"), fit)
      .join(df.select(col("id"), col("cls")), "id")
      .agg(avg(when(col("pred_label") === col("cls"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc < 0.7, s"linear probe should be near chance on XOR caps, got $acc")
  }

  test("XOR caps: spectral embedding separates what linear cannot") {
    // k = 9 with 10-point caps makes each cap an EXACT clique K₁₀: every
    // within-cap Laplacian mode sits at λ = 10 while Δ = 9 → c = 2Δ = 18,
    // so the power iteration suppresses ALL within-cap contamination by
    // (c/(c−λ))^iters = (18/8)¹² ≈ 2·10⁴ at the engine-default iteration
    // count and each cap collapses to a point; the across-component
    // indicator space (eigenvalue exactly c) survives untouched — that is
    // what separates the classes. A sparser graph (small k) shrinks the
    // gap and leaves visible within-cap spread — measured ~1.07×/iter
    // decay at k=12/perCap=25 — which is why the fixture pins the clique
    // regime.
    val df = caps(10).toDF("id", "vec", "cls")
    val emb = Spectral.embed2d(df, "id", "vec", k = 9, iters = 12)
      .join(df.select(col("id"), col("cls")), "id")
      .select(col("id"), col("e1"), col("e2"), col("cls"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getString(3)))
    assert(emb.length == 40)
    // leave-one-out 1-NN in the embedded plane: every point's nearest
    // neighbor shares its class — the separation PCA/linear cannot produce
    val wrong = emb.count { case (id, x, y, cls) =>
      val nn = emb.filter(_._1 != id)
        .minBy { case (_, x2, y2, _) => (x2 - x) * (x2 - x) + (y2 - y) * (y2 - y) }
      nn._4 != cls
    }
    assert(wrong == 0, s"$wrong/40 embedded points have a wrong-class nearest neighbor")
    // and the caps are genuinely TIGHT vs the across-cap geometry: max
    // within-cap spread well under the min across-cap centroid distance
    val byCap = emb.groupBy { case (id, _, _, _) => id / 10 }
    val cents = byCap.map { case (c, ps) =>
      c -> (ps.map(_._2).sum / ps.length, ps.map(_._3).sum / ps.length)
    }
    val within = byCap.map { case (c, ps) =>
      val (cx, cy) = cents(c)
      ps.map { case (_, x, y, _) =>
        math.sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy)) }.max
    }.max
    val across = cents.toSeq.combinations(2).map { case Seq((_, (ax, ay)), (_, (bx, by))) =>
      math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
    }.min
    assert(within * 3 < across,
      s"caps not tight: max within-cap spread $within vs min across-cap distance $across")
  }

  test("knnEdges is symmetric, self-loop-free, with degree >= k") {
    val df = caps(10).toDF("id", "vec", "cls")
    val e = Spectral.knnEdges(df, "id", "vec", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e.nonEmpty)
    assert(e.forall { case (s, d) => s != d }, "self loop")
    val set = e.toSet
    assert(e.forall { case (s, d) => set((d, s)) }, "asymmetric edge")
    val deg = e.groupBy(_._2).map(_._2.length)
    assert(deg.forall(_ >= 4), s"degree under k: ${deg.min}")
  }

  test("canonical sign: first nonzero component in id order is positive") {
    val df = caps(10).toDF("id", "vec", "cls")
    val rows = Spectral.embed2d(df, "id", "vec", k = 4, iters = 8)
      .orderBy(col("id")).collect()
    def firstNonZero(get: org.apache.spark.sql.Row => Double): Double =
      rows.iterator.map(get).find(_ != 0.0).getOrElse(0.0)
    assert(firstNonZero(_.getDouble(1)) >= 0.0)
    assert(firstNonZero(_.getDouble(2)) >= 0.0)
    // iterate scale contract: components live in [-1, 1] (quantized units)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("local solve is bit-identical to the forced-distributed path") {
    // the gate graphs ride the driver-local fast path; this pins the
    // equality contract that makes that legal — identical (id, e1, e2)
    // triples, bit for bit, on a graph with asymmetric degrees
    val df = caps(12).toDF("id", "vec", "cls")
    val edges = Spectral.knnEdges(df, "id", "vec", k = 5)
      .localCheckpoint(true) // one shared edge set for both runs
    val nodes = df.select(col("id"))
    val local = Spectral.embed2dFromEdges(edges, nodes, iters = 8)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val dist = Spectral.embed2dFromEdges(edges, nodes, iters = 8,
        localSolveMaxNodes = 0L)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(local == dist)
  }

  test("embed2d rejects degenerate inputs") {
    val tiny = Seq((0L, Seq(1.0f, 0.0f), "A"), (1L, Seq(0.0f, 1.0f), "B"))
      .toDF("id", "vec", "cls")
    val e = intercept[IllegalArgumentException] {
      Spectral.embed2d(tiny, "id", "vec", k = 1, iters = 2).collect()
    }
    assert(e.getMessage.contains(">= 3 rows"))
    val df = caps(10).toDF("id", "vec", "cls")
    assert(intercept[IllegalArgumentException] {
      Spectral.embed2d(df, "id", "vec", k = 0)
    }.getMessage.contains("k must be"))
    assert(intercept[IllegalArgumentException] {
      Spectral.embed2d(df, "id", "vec", iters = 0)
    }.getMessage.contains("iters must be"))
  }
}
