package graft.ext

import graft.SparkTestBase

/** BM25 ranking ([[Bm25]]): retrieval direction (term-dense docs first,
  * rare terms weighted over common ones), absent-term docs score zero, and
  * deterministic tie-breaks. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  test("docs dense in the query term rank first; absent-term docs score 0") {
    val docs = Seq(
      (1L, "apple apple apple pear"),
      (2L, "apple pear plum quince"),
      (3L, "pear plum quince fig"),
      (4L, "apple apple pear plum")).toDF("doc_id", "text")
    val out = Bm25.rank(docs, "doc_id", "text", Seq("apple"), k = 4)
      .collect()
    assert(out.map(_.getLong(1)).take(3).toSeq === Seq(1L, 4L, 2L),
      "rank must follow tf under equal length")
    assert(out(3).getLong(1) === 3L && out(3).getLong(2) === 0L,
      "doc without the term scores exactly 0")
  }

  test("a rarer term outweighs a common one at equal tf") {
    // 'rare' in 1 of 10 docs, 'common' in all 10
    val docs = ((1L to 9L).map(i => (i, "common filler words here")) :+
      (10L, "common rare filler here")).toDF("doc_id", "text")
    val out = Bm25.rank(docs, "doc_id", "text", Seq("rare", "common"), k = 10)
      .collect()
    assert(out.head.getLong(1) === 10L, "the doc holding the rare term wins")
    // remaining docs tie exactly → rank resolves by doc_id ascending
    assert(out.tail.map(_.getLong(1)).toSeq === (1L to 9L).toSeq)
    assert(out.tail.map(_.getLong(2)).distinct.length === 1)
  }

  test("longer docs are penalized at equal tf (length normalization)") {
    val docs = Seq(
      (1L, "term one two"),
      (2L, "term one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val out = Bm25.rank(docs, "doc_id", "text", Seq("term"), k = 2).collect()
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getLong(2) > out(1).getLong(2))
  }

  test("duplicate query terms count twice, like the per-term fold they sum") {
    // each duplicate contributes its own term in the score fold — the
    // one-pass tf must hand BOTH indices the same count
    val docs = Seq((1L, "apple pear"), (2L, "pear plum")).toDF("doc_id", "text")
    val once = Bm25.rank(docs, "doc_id", "text", Seq("apple"), k = 2).collect()
    val twice = Bm25.rank(docs, "doc_id", "text", Seq("apple", "apple"), k = 2)
      .collect()
    assert(twice.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      once.map(r => (r.getLong(1), r.getLong(2) * 2)).toSeq)
  }

  test("degenerate corpus (all documents empty) raises, never scores 0") {
    // avgdl = 0 would make dl/avgdl NaN and round(NaN·1e6)::long silently
    // 0 — the guard turns that into a hard error (ADVICE r13)
    val docs = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bm25.rank(docs, "doc_id", "text", Seq("apple"), k = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("degenerate corpus")))
    // an EMPTY corpus (0 rows) yields an empty result, not an error
    val empty = docs.filter($"doc_id" < 0L)
    assert(Bm25.rank(empty, "doc_id", "text", Seq("apple"), k = 1).count() === 0L)
  }

  test("rankMany: each query's batch result equals its solo rank run") {
    val docs = Seq(
      (1L, "apple apple pear plum"),
      (2L, "apple pear plum quince"),
      (3L, "pear plum quince fig"),
      (4L, "fig quince plum apple")).toDF("doc_id", "text")
    val queries = Seq(
      0L -> Seq("apple", "pear"),
      1L -> Seq("pear", "apple"), // reversed fold order
      2L -> Seq("fig"))
    val batch = Bm25.rankMany(docs, "doc_id", "text", queries, k = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1))
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
    queries.foreach { case (qid, ts) =>
      val solo = Bm25.rank(docs, "doc_id", "text", ts, k = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch(qid) === solo, s"query $qid diverged from the solo run")
    }
  }

  test("rankMany validates ids, empty queries, and empty term lists") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bm25.rankMany(docs, "doc_id", "text", Seq.empty, k = 1)
    }
    intercept[IllegalArgumentException] {
      Bm25.rankMany(docs, "doc_id", "text",
        Seq(0L -> Seq("a"), 0L -> Seq("b")), k = 1)
    }
    intercept[IllegalArgumentException] {
      Bm25.rankMany(docs, "doc_id", "text", Seq(0L -> Seq.empty), k = 1)
    }
  }
}
