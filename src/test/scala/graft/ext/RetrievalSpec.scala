package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion ([[Retrieval.rrfFuse]]): fused ordering, exact
  * pico-quantized scores, null per-list ranks outside a list's top-K, the
  * id tie-break, and the n cut. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def u12(terms: Double*): Long =
    math.round(terms.reduceLeft(_ + _) * 1e12)

  test("a doc in both lists outranks single-list docs; absent ranks are null") {
    val sparse = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val dense = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, "id", rrfK = 60, n = 10)
      .collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(20L, 10L, 40L, 30L))
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    // exact fused scores: same IEEE ops, sparse term first
    assert(out.map(_.getLong(2)).toSeq === Seq(
      u12(1.0 / 62, 1.0 / 61), u12(1.0 / 61, 0.0),
      u12(1.0 / 62, 0.0), u12(1.0 / 63, 0.0)))
    val byId = out.map(r => r.getLong(1) ->
      (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(byId(20L) === (Some(2L), Some(1L)))
    assert(byId(10L) === (Some(1L), None), "absent dense rank is null")
    assert(byId(40L) === (None, Some(2L)), "absent sparse rank is null")
  }

  test("equal fused scores break by id ascending") {
    val sparse = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val dense = Seq((3L, 1L), (4L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, "id", rrfK = 60, n = 10)
      .collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 3L, 2L, 4L))
  }

  test("n cuts the fused list; ranks stay 1..n") {
    val sparse = (1L to 8L).map(i => (i, i)).toDF("id", "rank")
    val dense = (5L to 12L).map(i => (i, i - 4L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, "id", rrfK = 60, n = 3)
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // docs 5..8 appear in both lists; 5 carries the best rank pair (5, 1)
    assert(out.head.getLong(1) === 5L)
  }

  test("per-query fusion equals single-query fusion per query") {
    val sparse = Seq((0L, 10L, 1L), (0L, 20L, 2L), (1L, 30L, 1L))
      .toDF("qid", "id", "rank")
    val dense = Seq((0L, 20L, 1L), (0L, 40L, 2L), (1L, 10L, 1L))
      .toDF("qid", "id", "rank")
    val batch = Retrieval.rrfFusePerQuery(sparse, dense, "qid", "id", 60, 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq }
    Seq(0L, 1L).foreach { q =>
      val solo = Retrieval.rrfFuse(
          sparse.filter(col("qid") === q).select(col("id"), col("rank")),
          dense.filter(col("qid") === q).select(col("id"), col("rank")),
          "id", 60, 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch(q) === solo, s"query $q diverged from single fusion")
    }
  }

  test("end to end: the hybrid surfaces lexical-only AND semantic-only " +
      "hits that each single leg misses") {
    // doc 10 matches the query TERMS (alpha/beta) but shares little other
    // vocabulary; doc 20 shares most of the query TEXT's vocabulary but
    // none of the BM25 terms — a term-only retrieval misses 20, a
    // cosine-only retrieval can miss 10; the fusion must surface both
    val docs = (Seq(
      (10L, "alpha beta filler misc"),
      (20L, "gamma delta epsilon zeta")) ++
      (30L to 45L).map(i => (i, s"noise$i other$i words$i junk$i")))
      .toDF("doc_id", "text")
    val qTerms = Seq("alpha", "beta")
    val qText = "alpha beta gamma delta epsilon zeta"
    val sparse = Bm25.rank(docs, "doc_id", "text", qTerms, k = 3)
      .select(col("doc_id"), col("rank"))
    val emb = docs.select(col("doc_id"),
      TextAnalysis.hashedTfEmbedding(col("text"), 64).as("emb"))
    val qdf = spark.range(1).select(col("id").as("qid"),
      TextAnalysis.hashedTfEmbedding(lit(qText), 64).as("emb"))
    val dense = Similarity.bruteForceTopK(emb, "doc_id", "emb",
        qdf, "qid", "emb", k = 3)
      .select(col("corpus_id").as("doc_id"), col("rank"))
    // each leg alone finds its own hit first
    assert(sparse.orderBy(col("rank")).head.getLong(0) === 10L)
    assert(dense.orderBy(col("rank")).head.getLong(0) === 20L)
    val fusedTop = Retrieval.rrfFuse(sparse, dense, "doc_id", 60, 2)
      .collect().map(_.getLong(1)).toSet
    assert(fusedTop === Set(10L, 20L),
      s"hybrid top-2 must be the lexical hit AND the semantic hit, got $fusedTop")
  }

  test("fusion is invariant under input partitioning and row order") {
    val sparse = (1L to 30L).map(i => (i, i)).toDF("id", "rank")
    val dense = (15L to 45L).map(i => (i, i - 14L)).toDF("id", "rank")
    val base = Retrieval.rrfFuse(sparse, dense, "id", 60, 10)
      .collect().toSeq
    val shuffled = Retrieval.rrfFuse(
      sparse.orderBy(rand(3)).repartition(5),
      dense.orderBy(rand(4)).repartition(3), "id", 60, 10).collect().toSeq
    assert(shuffled === base)
  }

  test("dcg weights are the pinned integer log2 discounts") {
    // the exact literals both the Spark plan and an external SQL replay
    // embed — if a platform's libm ever rounded differently this is the
    // test that catches it before a hash mismatch does
    assert(Retrieval.dcgWeightsU6(10) === Seq(1000000L, 630930L, 500000L,
      430677L, 386853L, 356207L, 333333L, 315465L, 301030L, 289065L))
  }

  test("rankingMetrics: hand-computed MRR and nDCG@3") {
    // retrieved: ranks 1..3 = docs 10 (gain 0), 20 (gain 2), 30 (gain 1)
    // corpus ideal gains: 3 (doc 40, unretrieved), 2, 1
    val topk = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("rank", "id")
    val gains = Seq((10L, 0L), (20L, 2L), (30L, 1L), (40L, 3L))
      .toDF("id", "g")
    val Seq(w1, w2, w3) = Retrieval.dcgWeightsU6(3)
    val r = Retrieval.rankingMetrics(topk, "rank", "id", gains, "id", "g", 3)
      .collect().head
    val dcg = 0L * w1 + 2L * w2 + 1L * w3
    val idcg = 3L * w1 + 2L * w2 + 1L * w3
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Long]("n_rel") === 2L)
    assert(r.getAs[Long]("dcg_u6") === dcg)
    assert(r.getAs[Long]("idcg_u6") === idcg)
    assert(r.getAs[Long]("ndcg_u6") === dcg * 1000000L / idcg)
    assert(r.getAs[Long]("mrr_u6") === 500000L, "first relevant at rank 2")
  }

  test("rankingMetrics: no relevant retrieved -> zero metrics, idcg intact") {
    val topk = Seq((1L, 10L)).toDF("rank", "id")
    val gains = Seq((10L, 0L), (40L, 3L)).toDF("id", "g")
    val r = Retrieval.rankingMetrics(topk, "rank", "id", gains, "id", "g", 3)
      .collect().head
    assert(r.getAs[Long]("n_rel") === 0L)
    assert(r.getAs[Long]("dcg_u6") === 0L)
    assert(r.getAs[Long]("ndcg_u6") === 0L)
    assert(r.getAs[Long]("mrr_u6") === 0L)
    assert(r.getAs[Long]("idcg_u6") === 3L * 1000000L,
      "ideal covers the corpus, not just the retrieved set")
  }

  test("rankingMetricsPerQuery equals the single-query form per query") {
    // three queries with distinct shapes: q0 mixed gains, q1 nothing
    // relevant retrieved, q2 perfect ranking — the grouped harness must
    // reproduce the single-query operator's row for each
    val topk = Seq(
      (0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L),
      (1L, 1L, 10L),
      (2L, 1L, 40L), (2L, 2L, 20L)).toDF("qid", "rank", "id")
    val gains = Seq(
      (0L, 10L, 0L), (0L, 20L, 2L), (0L, 30L, 1L), (0L, 40L, 3L),
      (1L, 10L, 0L), (1L, 40L, 3L),
      (2L, 40L, 3L), (2L, 20L, 2L), (2L, 10L, 0L))
      .toDF("qid", "id", "g")
    val grouped = Retrieval.rankingMetricsPerQuery(topk, "qid", "rank",
        "id", gains, "qid", "id", "g", 3)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(grouped.keySet === Set(0L, 1L, 2L))
    for (q <- Seq(0L, 1L, 2L)) {
      val single = Retrieval.rankingMetrics(
        topk.filter(col("qid") === q).drop("qid"), "rank", "id",
        gains.filter(col("qid") === q).drop("qid"), "id", "g", 3)
        .collect().head.toSeq
      assert(grouped(q) === single, s"query $q diverged from single-query")
    }
    // spot values: q2 is a perfect ranking -> ndcg = mrr = 1e6
    val Seq(w1, w2, _) = Retrieval.dcgWeightsU6(3)
    assert(grouped(2L) === Seq(3L, 2L, 3L * w1 + 2L * w2,
      3L * w1 + 2L * w2, 1000000L, 1000000L))
    // q1 retrieved nothing relevant but still gets its row
    assert(grouped(1L) === Seq(3L, 0L, 0L, 3L * 1000000L, 0L, 0L))
  }

  test("rankingMetricsPerQuery: a query with no judged docs still rows") {
    // query 7 retrieved docs that appear nowhere in the gains frame —
    // the eval-harness contract: it must not silently drop from the sweep
    val topk = Seq((7L, 1L, 99L)).toDF("qid", "rank", "id")
    val gains = Seq((0L, 10L, 1L)).toDF("qid", "id", "g")
    val r = Retrieval.rankingMetricsPerQuery(topk, "qid", "rank", "id",
        gains, "qid", "id", "g", 3)
      .collect()
    assert(r.length === 1 && r.head.getLong(0) === 7L)
    assert(r.head.toSeq.drop(1) === Seq(3L, 0L, 0L, 0L, 0L, 0L))
  }
}
