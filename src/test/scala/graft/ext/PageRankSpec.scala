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
    // per-NODE quantum: init pr = 1000000 each; base = 15e6 div 100 =
    // 150000. contribs: 1 sends 1000000 div 2 = 500000 to {2,3}; 2 sends
    // 1000000 to 3; 3 sends 1000000 to 1 → sums: 1:1000000, 2:500000,
    // 3:1500000. pr'(v) = 150000 + (85·s) div 100
    val got = prMap(PageRank.ranks(triangle, "src", "dst", iters = 1))
    assert(got === Map(
      1L -> (150000L + (85L * 1000000L) / 100L),   // 1000000
      2L -> (150000L + (85L * 500000L) / 100L),    //  575000
      3L -> (150000L + (85L * 1500000L) / 100L)))  // 1425000
    assert(got(1L) === 1000000L && got(2L) === 575000L
      && got(3L) === 1425000L)
    // mass conserved exactly on this no-dangling fixture
    assert(got.values.sum === 3L * PageRank.Quant)
  }

  test("iters=0 is the uniform init: Quant per node") {
    val got = prMap(PageRank.ranks(triangle, "src", "dst", iters = 0))
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("dangling nodes leak mass (directed input, outdeg 0)") {
    // 1→2, 3→2: node 2 has no out-edges, so its mass vanishes each step
    val e = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val got = prMap(PageRank.ranks(e, "src", "dst", iters = 1))
    // sums: 2 gets 1000000+1000000; 1 and 3 get nothing (base only)
    assert(got === Map(1L -> 150000L, 3L -> 150000L,
      2L -> (150000L + (85L * 2000000L) / 100L)))
    assert(got.values.sum < 3L * PageRank.Quant,
      "dangling mass must leak, not be redistributed")
  }

  test("symmetric input nearly conserves mass (floor leak only)") {
    // undirected 4-cycle passed in both directions: no dangling nodes, so
    // the only loss is the deterministic ≤1-micro-unit floor leak per term
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = prMap(PageRank.ranks(undirected, "src", "dst", iters = 10))
    val total = got.values.sum
    assert(total <= 4L * PageRank.Quant)
    assert(total > 4L * PageRank.Quant - 1000L,
      s"floor leak should be micro-units, lost ${4L * PageRank.Quant - total}")
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

  test("personalized: seed-gated init and base, hand-computed step") {
    val seeds = Seq(1L).toDF("id")
    // iters=0: seed starts at Quant, others at 0
    val init = prMap(PageRank.personalizedRanks(
      triangle, "src", "dst", seeds, "id", iters = 0))
    assert(init === Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L))
    // one step: contribs from init — 1 sends 500000 to {2,3}, 2 and 3
    // send 0. base 150000 lands ONLY at the seed; non-seeds earn rank
    // through in-links alone
    val got = prMap(PageRank.personalizedRanks(
      triangle, "src", "dst", seeds, "id", iters = 1))
    assert(got === Map(
      1L -> 150000L,                              // base + 85%·0
      2L -> (85L * 500000L) / 100L,               // 425000
      3L -> (85L * 500000L) / 100L))              // 425000
    // global form with an all-node seed set equals plain ranks
    val all = Seq(1L, 2L, 3L).toDF("id")
    assert(prMap(PageRank.personalizedRanks(
        triangle, "src", "dst", all, "id", iters = 3))
      === prMap(PageRank.ranks(triangle, "src", "dst", iters = 3)))
    // seeds not in the graph are ignored (no phantom nodes)
    val stray = Seq(1L, 99L).toDF("id")
    val withStray = PageRank.personalizedRanks(
      triangle, "src", "dst", stray, "id", iters = 1)
    assert(prMap(withStray).keySet === Set(1L, 2L, 3L))
  }
}
