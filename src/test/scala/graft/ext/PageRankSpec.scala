package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[PageRank]] unit coverage (the oracle queries `q_pagerank` /
  * `q_rank_best` pin the end-to-end DuckDB replay; this spec pins the
  * hand-computable semantics): one iteration on a 3-node graph computed by
  * hand in integer micro-units, iters=0 identity, dangling-node mass leak,
  * near-conservation on a symmetric graph, argument validation, and
  * partitioning-independence of the integer floor arithmetic.
  */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def prMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 1→2, 1→3, 2→3, 3→1: outdeg 1:2, 2:1, 3:1 — no dangling nodes
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    .toDF("src", "dst")

  test("one iteration matches the hand-computed floor arithmetic") {
    // init pr = 1000000 div 3 = 333333 each; base = 15e6 div 300 = 50000
    // contribs: 1 sends 333333 div 2 = 166666 to {2,3}; 2 sends 333333 to
    // 3; 3 sends 333333 to 1 → sums: 1:333333, 2:166666, 3:499999
    // pr'(v) = 50000 + (85·s) div 100
    val got = prMap(PageRank.ranks(triangle, "src", "dst", iters = 1))
    assert(got === Map(
      1L -> (50000L + (85L * 333333L) / 100L),   // 333333
      2L -> (50000L + (85L * 166666L) / 100L),   // 191666
      3L -> (50000L + (85L * 499999L) / 100L)))  // 474999
    assert(got(1L) === 333333L && got(2L) === 191666L && got(3L) === 474999L)
  }

  test("iters=0 is the uniform init: Quant div n per node") {
    val got = prMap(PageRank.ranks(triangle, "src", "dst", iters = 0))
    assert(got === Map(1L -> 333333L, 2L -> 333333L, 3L -> 333333L))
  }

  test("dangling nodes leak mass (directed input, outdeg 0)") {
    // 1→2, 3→2: node 2 has no out-edges, so its mass vanishes each step
    val e = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val got = prMap(PageRank.ranks(e, "src", "dst", iters = 1))
    // sums: 2 gets 333333+333333; 1 and 3 get nothing (base only)
    assert(got === Map(1L -> 50000L, 3L -> 50000L,
      2L -> (50000L + (85L * 666666L) / 100L)))
    assert(got.values.sum < PageRank.Quant,
      "dangling mass must leak, not be redistributed")
  }

  test("symmetric input nearly conserves mass (floor leak only)") {
    // undirected 4-cycle passed in both directions: no dangling nodes, so
    // the only loss is the deterministic ≤1-micro-unit floor leak per term
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = prMap(PageRank.ranks(undirected, "src", "dst", iters = 10))
    val total = got.values.sum
    assert(total <= PageRank.Quant)
    assert(total > PageRank.Quant - 1000L,
      s"floor leak should be micro-units, lost ${PageRank.Quant - total}")
    // symmetric regular graph → uniform fixed point (all degrees equal)
    assert(got.values.toSet.size === 1)
  }

  test("ranks are independent of input partitioning") {
    // ring + chords, enough structure that a float implementation would
    // show partition-order sensitivity; integer floors must not
    val edges = ((0L until 12L).map(i => (i, (i + 1) % 12)) ++
      Seq((0L, 6L), (3L, 9L), (7L, 2L), (11L, 5L), (4L, 4L)))
      .toDF("src", "dst")
    val a = prMap(PageRank.ranks(edges.repartition(1), "src", "dst", 5))
    val b = prMap(PageRank.ranks(edges.repartition(13), "src", "dst", 5))
    assert(a === b)
  }

  test("argument validation: iters, damping bounds, empty graph") {
    intercept[IllegalArgumentException] {
      PageRank.ranks(triangle, "src", "dst", iters = -1)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(triangle, "src", "dst", 1, dampNum = 101L, dampDen = 100L)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(triangle, "src", "dst", 1, dampNum = 1L, dampDen = 0L)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranks(triangle.filter(lit(false)), "src", "dst", 1)
    }
  }
}
