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
      val tf = element_at(col("__tf"), i + 1).cast("double")
      val df = col(s"df$i").cast("double")
      val idf = log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (dl / avgdl)))
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
}
