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
  * scoring is pure map-side expressions over each document's word array
  * (tf by `filter`, no explode, no per-term shuffle); selection is a
  * TakeOrdered. Nothing shuffles but the stats row and the top-k.
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
    val scored = withWs.crossJoin(broadcast(stats))
    val n = col("n_docs").cast("double")
    val dl = size(ws).cast("double")
    val avgdl = col("total_dl").cast("double") / n
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(ws, w => w === t)).cast("double")
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
