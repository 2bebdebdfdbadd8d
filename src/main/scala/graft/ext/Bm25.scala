package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a text column (Robertson & Zaragoza 2009;
  * the idf form is Lucene's `ln(1 + (N - df + .5)/(df + .5))`, always
  * non-negative). The text-side complement of the embedding ANN family:
  * "find the documents most relevant to these terms" without a vector
  * model. Beyond the reference's surface.
  *
  * == Determinism ==
  * Corpus statistics (N, total length, per-term document frequencies) are
  * exact integers; each document's score is a FIXED-ORDER left fold over
  * the query terms of single-expression double arithmetic, quantized to
  * integer micro-units for ranking — so ordering and output are
  * bit-replayable (constants are mirrored as the same decimal literals and
  * combined with the same IEEE ops in the oracle, never pre-evaluated).
  *
  * == 100 TB design ==
  * One aggregation pass produces a SINGLE stats row (broadcast cross join);
  * scoring is map-side over each document's word array — all per-term tfs
  * come from ONE hash-lookup pass over the words (a primitive UDF; the
  * expression form `size(filter(ws, _ === t))` per term was
  * O(words × terms) per document), no explode, no per-term shuffle;
  * selection is a TakeOrdered. Nothing shuffles but the stats row and the
  * top-k. A degenerate corpus (every document empty → avgdl undefined)
  * raises instead of silently scoring everything 0 through a NaN.
  */
object Bm25 {

  /** Micro-unit quantum for score ranking. */
  val Quant: Double = 1e6

  /** One term's BM25 contribution — the SINGLE definition of the score
    * arithmetic, shared by [[rank]] and [[rankMany]] so the IEEE op order
    * (and therefore the SQL replay) can never drift between them. */
  private def termContribution(tf0: Column, df0: Column, n: Column,
                               dl: Column, avgdl: Column,
                               k1: Double, b: Double): Column = {
    val tf = tf0.cast("double")
    val df = df0.cast("double")
    val idf = log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    idf * (tf * (lit(k1) + lit(1.0))) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (dl / avgdl)))
  }

  /** Top-`k` documents for `terms`: (rank, id, score_u6) with `score_u6`
    * the micro-unit-quantized BM25 score and rank 1-based over
    * (score_u6 desc, id asc). */
  def rank(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val withWs = docs.select(col(idCol),
      Corpus.words(col(textCol)).as("__ws"))
    val ws = col("__ws")
    val stats = withWs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(ws).cast("long")).as("total_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(ws, t), 1L).otherwise(0L)).as(s"df$i")
        }: _*)
    val n = col("n_docs").cast("double")
    val dl = size(ws).cast("double")
    // loud failure on the degenerate corpus: with every document empty
    // (total_dl = 0) dl/avgdl is 0/0 → NaN, and round(NaN·1e6)::long is 0 —
    // every score would silently collapse to 0. (A 0-row corpus never
    // reaches this branch: the cross join is empty.)
    val avgdl = col("total_dl").cast("double") /
      when(col("total_dl") > 0L, n).otherwise(raise_error(concat(
        lit("Bm25.rank: degenerate corpus (all documents empty; n_docs="),
        col("n_docs"), lit(")"))))
    // one pass over the words, one hash lookup each: tfs for ALL query
    // terms at once (duplicate terms share the same count, matching the
    // per-term filter form this replaces). Null word array (null text)
    // stays null, propagating exactly like size(filter(null, …)).
    val termIdx: Map[String, Seq[Int]] = terms.zipWithIndex
      .groupBy(_._1).map { case (t, ps) => t -> ps.map(_._2) }
    val nTerms = terms.length
    val tfUdf = udf { ws0: scala.collection.Seq[String] =>
      if (ws0 == null) null
      else {
        val c = new Array[Long](nTerms)
        ws0.foreach(w => termIdx.get(w).foreach(_.foreach(c(_) += 1L)))
        c
      }
    }
    // named column, not an inline expression: each term's contribution
    // reads the same array, and a per-reference inline would re-run the
    // UDF `terms.length` times per row (CollapseProject keeps the
    // projection boundary for repeated non-cheap expressions)
    val scored = withWs.crossJoin(broadcast(stats))
      .withColumn("__tf", tfUdf(ws))
    val contribs = terms.zipWithIndex.map { case (_, i) =>
      termContribution(element_at(col("__tf"), i + 1), col(s"df$i"),
        n, dl, avgdl, k1, b)
    }
    val score = contribs.reduceLeft(_ + _)
    val top = scored
      .select(col(idCol),
        round(score * Quant).cast("long").as("score_u6"))
      .orderBy(col("score_u6").desc, col(idCol))
      .limit(k)
    top.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score_u6").desc, col(idCol)))
        .cast("long").as("rank"),
      col(idCol), col("score_u6"))
  }

  /** BATCH retrieval: top-`k` per query for a bounded set of term-list
    * queries — `(query_id, rank, <idCol>, score_u6)`. The production
    * serving shape (contamination probes, eval-suite retrieval, dedup
    * lookups run as a batch), priced as ONE corpus pass instead of
    * |queries| separate [[rank]] jobs.
    *
    * == 100 TB design ==
    * The stats row covers the UNION of all query terms (still one
    * aggregation, one broadcast row); one hash-lookup UDF pass yields
    * every query's tfs; per-query scores explode to NARROW
    * `(query_id, id, score_u6)` rows and the per-query top-k is the
    * two-phase `WindowGroupLimit` cut — each partition forwards at most k
    * rows per query into the shuffle, so the exchange carries
    * ≤ |queries|·k·partitions rows regardless of corpus size. Queries are
    * plan literals like [[rank]]'s term list: the batch must be
    * driver-bounded.
    *
    * Determinism matches [[rank]] term for term: the same
    * [[termContribution]] ops folded in each query's own term order,
    * micro-quantized, ties by id ASC. */
  def rankMany(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(queries.map(_._1).distinct.length == queries.length,
      s"duplicate query ids: ${queries.map(_._1)}")
    queries.foreach { case (qid, ts) =>
      require(ts.nonEmpty, s"query $qid has no terms") }
    require(k >= 1, s"k must be >= 1, got $k")
    val allTerms: Seq[String] = queries.flatMap(_._2).distinct
    val withWs = docs.select(col(idCol),
      Corpus.words(col(textCol)).as("__ws"))
    val ws = col("__ws")
    val stats = withWs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(ws).cast("long")).as("total_dl") +:
        allTerms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(ws, t), 1L).otherwise(0L)).as(s"df$i")
        }: _*)
    val n = col("n_docs").cast("double")
    val dl = size(ws).cast("double")
    val avgdl = col("total_dl").cast("double") /
      when(col("total_dl") > 0L, n).otherwise(raise_error(concat(
        lit("Bm25.rankMany: degenerate corpus (all documents empty; " +
          "n_docs="), col("n_docs"), lit(")"))))
    val posOf: Map[String, Int] = allTerms.zipWithIndex.toMap
    val nTerms = allTerms.length
    val tfUdf = udf { ws0: scala.collection.Seq[String] =>
      if (ws0 == null) null
      else {
        val c = new Array[Long](nTerms)
        ws0.foreach(w => posOf.get(w).foreach(c(_) += 1L))
        c
      }
    }
    val scored = withWs.crossJoin(broadcast(stats))
      .withColumn("__tf", tfUdf(ws))
    val perQuery = queries.map { case (qid, ts) =>
      val score = ts.map { t =>
        val i = posOf(t)
        termContribution(element_at(col("__tf"), i + 1), col(s"df$i"),
          n, dl, avgdl, k1, b)
      }.reduceLeft(_ + _)
      struct(lit(qid).cast("long").as("query_id"),
        round(score * Quant).cast("long").as("score_u6"))
    }
    val exploded = scored
      .select(col(idCol), explode(array(perQuery: _*)).as("__q"))
      .select(col("__q.query_id").as("query_id"), col(idCol),
        col("__q.score_u6").as("score_u6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_u6").desc, col(idCol))
    exploded.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("score_u6"))
  }
}
