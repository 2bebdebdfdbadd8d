package graft.ext

import graft.SparkTestBase
import graft.ml.ExactKMeans
import org.apache.spark.sql.functions._

/** D4 prototype-drop ([[Diversify]]): the closest-to-centroid fraction of
  * each cell is dropped (floor semantics, id tie-break), the fraction
  * bounds behave, and the verdicts are invariant to partitioning. */
class DiversifySpec extends SparkTestBase {
  import spark.implicits._

  // two clean 1-d-ish clusters around (0,0) and (1,0); iters=0 keeps the
  // member-init centroids, so per-cell distances are hand-computable
  private def fixture = Seq(
    (0L, Seq(0.0, 0.0)), (1L, Seq(0.1, 0.0)),
    (2L, Seq(0.2, 0.0)), (3L, Seq(0.3, 0.0)),
    (4L, Seq(1.0, 0.0)), (5L, Seq(0.9, 0.0)),
    (6L, Seq(0.8, 0.0)), (7L, Seq(0.7, 0.0))).toDF("id", "vec")

  private def fit0 = ExactKMeans.fit(fixture, "id", "vec",
    initIds = Seq(0L, 4L), iters = 0)

  test("the floor(n/4) most-prototypical members of each cell are dropped") {
    val out = Diversify.prototypeDrop(fixture, "id", "vec", fit0, 1L, 4L)
      .orderBy(col("id")).collect()
    // cell 0 holds ids 0..3 (0 closest), cell 1 holds 4..7 (4 closest):
    // floor(4·1/4) = 1 dropped per cell → the centroid members 0 and 4 go
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 5L, 6L, 7L))
    // survivor ranks start after the dropped prototype (rank 1)
    assert(out.filter(_.getInt(1) == 0).map(_.getLong(2)).toSeq ===
      Seq(2L, 3L, 4L))
  }

  test("keep flags cover every row; kept == not the per-cell prototype") {
    val flags = Diversify.prototypeKeepFlags(fixture, "id", "vec", fit0, 1L, 4L)
      .orderBy(col("id")).collect()
    assert(flags.length === 8)
    assert(flags.map(r => r.getLong(0) -> r.getBoolean(1)).toMap ===
      Map(0L -> false, 1L -> true, 2L -> true, 3L -> true,
        4L -> false, 5L -> true, 6L -> true, 7L -> true))
  }

  test("dropNum=0 keeps everything; dropNum=dropDen drops everything") {
    assert(Diversify.prototypeDrop(fixture, "id", "vec", fit0, 0L, 4L)
      .count() === 8L)
    assert(Diversify.prototypeDrop(fixture, "id", "vec", fit0, 4L, 4L)
      .count() === 0L)
  }

  test("floor semantics on an odd cell; equal-score ties drop the lower id") {
    // one cell of 5: two exact copies of the centroid (ids 0, 1) tie at
    // the top — id ASC ranks 0 first, so floor(5/4)=1 drops id 0 only
    val df = Seq(
      (0L, Seq(0.5, 0.5)), (1L, Seq(0.5, 0.5)), (2L, Seq(0.6, 0.5)),
      (3L, Seq(0.7, 0.5)), (4L, Seq(0.8, 0.5))).toDF("id", "vec")
    val f = ExactKMeans.fit(df, "id", "vec", initIds = Seq(0L), iters = 0)
    val kept = Diversify.prototypeDrop(df, "id", "vec", f, 1L, 4L)
      .orderBy(col("id")).collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L, 2L, 3L, 4L))
  }

  test("verdicts are invariant under repartitioning and row order") {
    val base = Diversify.prototypeKeepFlags(fixture, "id", "vec", fit0, 1L, 4L)
      .orderBy(col("id")).collect().toSeq
    val shuffled = Diversify.prototypeKeepFlags(
        fixture.orderBy(rand(7)).repartition(7), "id", "vec", fit0, 1L, 4L)
      .orderBy(col("id")).collect().toSeq
    assert(shuffled === base)
  }

  test("fraction bounds are hard errors") {
    intercept[IllegalArgumentException] {
      Diversify.prototypeDrop(fixture, "id", "vec", fit0, 5L, 4L)
    }
    intercept[IllegalArgumentException] {
      Diversify.prototypeDrop(fixture, "id", "vec", fit0, 1L, 0L)
    }
  }
}
