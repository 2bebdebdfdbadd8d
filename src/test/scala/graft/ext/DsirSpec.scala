package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance resampling ([[Dsir]]): the selection direction (docs
  * resembling the target rank first), ratio-table totality, weight
  * hand-check on a 1-bucket-dominated fixture, and Gumbel determinism. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 64

  test("docs resembling the target corpus outrank the rest") {
    // target style: "alpha beta" bigrams; noise style: distinct gibberish
    val docs = ((1L to 20L).map(i => (i, "alpha beta alpha beta", "en")) ++
      (101L to 120L).map(i => (i, s"junk$i noise$i other$i", "xx")))
      .toDF("doc_id", "text", "lang")
    val ratios = Dsir.fitLogRatios(spark,
      docs.filter($"lang" === "en"), docs, "text", m)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", ratios, m)
    val top = Dsir.selectTopK(w, "doc_id", 20).select("doc_id")
      .as[Long].collect().toSet
    assert(top === (1L to 20L).toSet,
      s"top-20 should be exactly the target-style docs, got $top")
  }

  test("ratio table is total: exactly m rows, every bucket present") {
    val docs = Seq((1L, "a b c", "en"), (2L, "d e", "xx"))
      .toDF("doc_id", "text", "lang")
    val ratios = Dsir.fitLogRatios(spark,
      docs.filter($"lang" === "en"), docs, "text", m)
    assert(ratios.count() === m.toLong)
    assert(ratios.select("f").as[Long].collect().toSet === (0L until m).toSet)
  }

  test("weights hand-check against the closed-form ratio formula") {
    // single-word docs → each doc contributes exactly one unigram occurrence
    val docs = Seq((1L, "aaa", "en"), (2L, "aaa", "xx"), (3L, "bbb", "xx"))
      .toDF("doc_id", "text", "lang")
    val ratios = Dsir.fitLogRatios(spark,
      docs.filter($"lang" === "en"), docs, "text", m)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", ratios, m)
      .orderBy("doc_id").collect()
    // target: {aaa:1}, T=1; raw: {aaa:2, bbb:1}, Q=3; alpha=1
    val am = 1.0 * m
    def llr(ct: Long, cq: Long) = math.round(
      (math.log((ct + 1.0) / (1.0 + am)) - math.log((cq + 1.0) / (3.0 + am)))
        * 1e6)
    assert(w(0).getLong(2) === llr(1, 2)) // doc 1: aaa
    assert(w(1).getLong(2) === llr(1, 2)) // doc 2: aaa
    assert(w(2).getLong(2) === llr(0, 1)) // doc 3: bbb
    assert(w(0).getLong(2) > w(2).getLong(2))
  }

  test("fit tokenizes each corpus once: totals reuse the count exchange") {
    // fitLogRatios derives tt/tq from the (f, count) tables, so the
    // tokenize→explode→groupBy(f) exchange of each corpus has two
    // consumers (the ratio join and the total) — one compute, one reuse,
    // visible as ReusedExchange on the executed plan.
    val docs = (1L to 100L).map(i => (i, s"tok$i alpha beta gamma", "en"))
      .toDF("doc_id", "text", "lang")
    val ratios = Dsir.fitLogRatios(spark, docs.limit(40), docs, "text", m)
    ratios.collect()
    val plan = ratios.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "count exchange must feed both the join and the total:\n" +
        plan.take(4000))
  }

  test("empty docs keep a zero-weight row; gumbel is seed-deterministic") {
    val docs = Seq((1L, "a b", "en"), (2L, "", "xx"), (3L, "c", "xx"))
      .toDF("doc_id", "text", "lang")
    val ratios = Dsir.fitLogRatios(spark,
      docs.filter($"lang" === "en"), docs, "text", m)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", ratios, m)
    val empty = w.filter($"doc_id" === 2L).collect()(0)
    assert(empty.getLong(1) === 0L && empty.getLong(2) === 0L)
    val g1 = Dsir.gumbelTopK(w, "doc_id", 3, seed = 7L).collect().toSeq
    val g2 = Dsir.gumbelTopK(w, "doc_id", 3, seed = 7L).collect().toSeq
    val g3 = Dsir.gumbelTopK(w, "doc_id", 3, seed = 8L)
      .select("g_u6").as[Long].collect().toSeq
    assert(g1 === g2, "same seed must reproduce the same draw")
    assert(g3 !== g1.map(_.getLong(3)), "a different seed must perturb keys")
  }
}
