package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Hits]] unit coverage (the q_hits oracle pins the end-to-end replay;
  * this spec pins hand-computable semantics): one iteration on a 3-node
  * DAG by hand, iters=0 identity, max-normalization invariant, hub/auth
  * asymmetry on a star, partitioning independence, validation.
  */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  private def m(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  // 1→2, 1→3, 2→3
  private def dag = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")

  test("one iteration matches the hand-computed normalization") {
    // a_raw: 2←h(1)=1e6, 3←h(1)+h(2)=2e6 → max 2e6 →
    //   a = (raw·1e6)//2e6: a(1)=0, a(2)=500000, a(3)=1000000
    // h_raw: 1←a(2)+a(3)=1.5e6, 2←a(3)=1e6 → max 1.5e6 →
    //   h(1)=1000000, h(2)=(1e6·1e6)//1.5e6=666666, h(3)=0
    val got = m(Hits.scores(dag, "src", "dst", iters = 1))
    assert(got === Map(
      1L -> (1000000L, 0L),
      2L -> (666666L, 500000L),
      3L -> (0L, 1000000L)))
  }

  test("iters=0 is the uniform init; both sides max at Quant always") {
    val got = m(Hits.scores(dag, "src", "dst", iters = 0))
    assert(got.values.forall(_ == (Hits.Quant, Hits.Quant)))
    (1 to 4).foreach { k =>
      val s = m(Hits.scores(dag, "src", "dst", k))
      assert(s.values.map(_._1).max == Hits.Quant)
      assert(s.values.map(_._2).max == Hits.Quant)
    }
  }

  test("star graph separates hubs from authorities") {
    // center links to every leaf: center is the ONLY hub, leaves the
    // only authorities — at every iteration count
    val star = (2L to 6L).map(v => (1L, v)).toDF("src", "dst")
    val got = m(Hits.scores(star, "src", "dst", iters = 3))
    assert(got(1L) === (Hits.Quant, 0L))
    (2L to 6L).foreach(v => assert(got(v) === (0L, Hits.Quant)))
  }

  test("partitioning-independent, validation") {
    val a = m(Hits.scores(dag.repartition(1), "src", "dst", 4))
    val b = m(Hits.scores(dag.repartition(13), "src", "dst", 4))
    assert(a === b)
    intercept[IllegalArgumentException] {
      Hits.scores(dag, "src", "dst", iters = -1)
    }
    intercept[IllegalArgumentException] {
      Hits.scores(dag.filter(lit(false)), "src", "dst", 1)
    }
  }
}
