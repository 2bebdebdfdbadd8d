package graft.ml

import graft.SparkTestBase
import graft.spec._
import graft.runner.LocalSparkRunner
import org.apache.spark.sql.functions._

class ExactKMeansSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-computable fixture: one Lloyd pass, exact centroids and cells") {
    // init m0 = q(id0) = (200000, 0); m1 = q(id2) = (-200000, 100000).
    // iter 1 assigns {0,1} → cell 0, {2,3} → cell 1; update means:
    // m0 = (300000, 0), m1 = (-300000, 100000)
    val df = Seq(
      (0L, Seq(0.2, 0.0)), (1L, Seq(0.4, 0.0)),
      (2L, Seq(-0.2, 0.1)), (3L, Seq(-0.4, 0.1)))
      .toDF("id", "v")
    val fit = ExactKMeans.fit(df, "id", "v", Seq(0L, 2L), iters = 1)
    assert(fit.qm.map(_.toSeq).toSeq ==
      Seq(Seq(300000L, 0L), Seq(-300000L, 100000L)))
    val a = ExactKMeans.assign(df, col("id"), col("v"), fit)
      .orderBy("id").collect()
    assert(a.map(_.getInt(1)).toSeq == Seq(0, 0, 1, 1))
    // id1 vs fitted m0: (400000·300000 − 300000²/2)/1e12 = 0.075
    assert(a(1).getDouble(2) == 0.075)
  }

  test("assignByDistance: same cells as assign, exact integer d2") {
    val df = Seq(
      (0L, Seq(0.2, 0.0)), (1L, Seq(0.4, 0.0)),
      (2L, Seq(-0.2, 0.1)), (3L, Seq(-0.4, 0.1)))
      .toDF("id", "v")
    val fit = ExactKMeans.fit(df, "id", "v", Seq(0L, 2L), iters = 1)
    val byScore = ExactKMeans.assign(df, col("id"), col("v"), fit)
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    val byDist = ExactKMeans.assignByDistance(df, col("id"), col("v"), fit)
      .orderBy("id").collect()
    assert(byDist.map(_.getInt(1)).toSeq == byScore)
    // id1 vs fitted m0 = (300000, 0): (400000−300000)² + 0² = 1e10
    assert(byDist(1).getLong(2) == 10000000000L)
    // the bound is enforced on the way in, like exactScores
    val bad = Seq((0L, Seq(1.5, 0.0))).toDF("id", "v")
    val e = intercept[Exception] {
      ExactKMeans.assignByDistance(bad, col("id"), col("v"), fit).collect()
    }
    assert(e.getMessage.contains("maxAbsInput"))
  }

  test("empty cells carry their previous centroid (duplicate-vector init)") {
    // two inits with IDENTICAL vectors: in iteration 1 every row ties on
    // score and first-max sends ALL members to cell 0 — cell 1 is empty
    // and must keep its initial member centroid verbatim (a non-carrying
    // implementation would zero it), while cell 0 moves to the global mean
    val df = Seq(
      (0L, Seq(0.2, 0.0)), (1L, Seq(0.2, 0.0)),
      (2L, Seq(0.3, 0.0)), (3L, Seq(0.25, 0.1)))
      .toDF("id", "v")
    val fit = ExactKMeans.fit(df, "id", "v", Seq(0L, 1L), iters = 1)
    assert(fit.qm(1).toSeq == Seq(200000L, 0L), "empty cell must carry")
    // mean of all four: ((0.2+0.2+0.3+0.25)/4, 0.1/4) = (0.2375, 0.025)
    assert(fit.qm(0).toSeq == Seq(237500L, 25000L))
    // with the moved cell-0 centroid, the (0.2, 0) rows now sit EXACTLY on
    // the carried cell-1 centroid and re-assign there
    val cells = ExactKMeans.assign(df, col("id"), col("v"), fit)
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(cells == Seq(1, 1, 0, 0))
  }

  test("fit and assign are invariant under repartitioning and row order") {
    val rng = new scala.util.Random(19)
    val df = (0 until 240).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextDouble() * 1.8 - 0.9)))
      .toDF("id", "v")
    val f1 = ExactKMeans.fit(df, "id", "v", 0L until 6L, iters = 3)
    val f2 = ExactKMeans.fit(df.repartition(13).orderBy(col("id").desc),
      "id", "v", 0L until 6L, iters = 3)
    assert(f1.qm.map(_.toSeq).toSeq == f2.qm.map(_.toSeq).toSeq)
    val a1 = ExactKMeans.assign(df, col("id"), col("v"), f1)
      .orderBy("id").collect()
    val a2 = ExactKMeans.assign(df.repartition(7), col("id"), col("v"), f2)
      .orderBy("id").collect()
    a1.zip(a2).foreach { case (x, y) => assert(x == y) } // bit-exact
  }

  test("recovers three separated clusters from one-member-per-cluster init") {
    val rng = new scala.util.Random(23)
    val df = (0 until 300).map { i =>
      val c = i % 3
      (i.toLong, Seq.tabulate(4)(d =>
        (if (d == c) 0.5 else 0.0) + (rng.nextDouble() - 0.5) * 0.1))
    }.toDF("id", "v")
    // ids 0, 1, 2 are one member of each cluster
    val fit = ExactKMeans.fit(df, "id", "v", Seq(0L, 1L, 2L), iters = 4)
    val cells = ExactKMeans.assign(df, col("id"), col("v"), fit)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // every row lands in the cell seeded by its own cluster's member
    assert(cells.forall { case (id, cell) => cell == (id % 3).toInt })
    // and the fitted centroids are near the true cluster centers
    (0 until 3).foreach { c =>
      assert(math.abs(fit.qm(c)(c) - 500000L) < 20000L,
        s"centroid $c: ${fit.qm(c).toSeq}")
    }
  }

  test("pruned assignment equals dense, cell for cell, d2 for d2") {
    // 400 rows, 48 member-init centroids: enough groups (g = 7) that the
    // triangle-inequality pruning genuinely fires, seeded so reruns pin
    // the same fixture; equality must hold including ties (duplicate
    // centroid vectors map to the FIRST index, both paths)
    val rng = new scala.util.Random(101)
    val base = (0L until 400L).map(i =>
      (i, Seq.fill(8)(math.floor(rng.nextDouble() * 200) / 100.0 - 1.0)))
    // plant a duplicate centroid pair: members 7 and 11 share a vector
    val rows = base.map { case (i, v) => if (i == 11L) (i, base(7)._2) else (i, v) }
    val df = rows.toDF("id", "vec").repartition(5)
    val fit = ExactKMeans.fit(df, "id", "vec", initIds = 0L until 48L,
      iters = 2)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val dense = canon(ExactKMeans.assignByDistance(df, col("id"), col("vec"), fit))
    val pruned = canon(ExactKMeans.assignByDistancePruned(df, col("id"), col("vec"), fit))
    assert(pruned === dense)
    // the quantized-exact input contract holds in the pruned path too
    val bad = Seq((0L, Seq(0.1, 2.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("id", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      ExactKMeans.assignByDistancePruned(bad, col("id"), col("vec"), fit)
        .collect()
    }
    assert(e.getMessage.contains("maxAbsInput") ||
      Option(e.getCause).exists(_.getMessage.contains("maxAbsInput")))
  }

  test("init validation: missing, duplicate, and out-of-bound member ids") {
    val df = Seq((0L, Seq(0.2, 0.0)), (1L, Seq(1.4, 0.0)), (2L, Seq(0.1, 0.3)))
      .toDF("id", "v")
    assert(intercept[IllegalArgumentException] {
      ExactKMeans.centroidsByIds(df, "id", "v", Seq(0L, 9L))
    }.getMessage.contains("not found"))
    assert(intercept[IllegalArgumentException] {
      ExactKMeans.centroidsByIds(df, "id", "v", Seq(0L, 0L))
    }.getMessage.contains("duplicate"))
    // id 1 sits past maxAbs=1.0: its member centroid breaks the bound
    assert(intercept[IllegalArgumentException] {
      ExactKMeans.centroidsByIds(df, "id", "v", Seq(0L, 1L))
    }.getMessage.contains("exceeds maxAbsInput"))
    // widening the bound legalizes it
    assert(ExactKMeans.centroidsByIds(df, "id", "v", Seq(0L, 1L),
      maxAbs = 2.0)(1).toSeq == Seq(1400000L, 0L))
  }

  test("KMeansClusterOp: categorical cluster ids, store round-trip, mask composition") {
    val store = newStoreDir()
    val r = new LocalSparkRunner(spark, store)
    val rng = new scala.util.Random(29)
    val rows = (0 until 120).map { i =>
      Seq.tabulate(4)(d =>
        (if (d == i % 2) 0.4 else 0.0) + (rng.nextDouble() - 0.5) * 0.1)
    }
    val ds = LoadInlineJsonDatasetOp(Map("emb" -> rows))
    val km = KMeansClusterOp(SelectVectorColumnOp(ds, "emb"),
      Seq(0L, 1L), iters = 3L)
    val vals = r.toValues(km).map(_.asInstanceOf[String])
    assert(vals.toSet == Set("0", "1"))
    assert(vals.zipWithIndex.forall { case (v, i) => v == (i % 2).toString })
    // categorical contract: flows into is_in masks
    val mask = CategoryToBooleanOp(km, Some(Seq("1")))
    val kept = r.toValues(mask).map(_.asInstanceOf[Boolean])
    assert(kept.count(identity) == 60)
    // store round-trip: a fresh runner serves the result without refit
    val r2 = new LocalSparkRunner(spark, store)
    assert(r2.hasResult(km))
    assert(r2.toValues(km).map(_.asInstanceOf[String]) == vals)
    // spec serde round-trip through graph JSON
    val back = Graph.deserializeString(Graph.serializeToString(km))
    assert(back.exists(_.uuid == km.uuid))
  }
}
