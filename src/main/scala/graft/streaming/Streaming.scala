package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's continuous-ingest operators.
  *
  * The reference is batch-only (SURVEY §2.9 — no streaming surface), so
  * nothing here shadows a reference op; these exist because a 100 TB
  * training-data pipeline ingests continuously, and the Spark-first way to
  * express that is `readStream` → the SAME column expressions the batch
  * operators use → `writeStream` with watermarked state. Every transform
  * below is a plain DataFrame function: callers pass a streaming frame and
  * get a streaming frame (the functions also work verbatim on batch frames,
  * which is how the tests assert batch parity).
  *
  * Scale notes (1000-executor framing):
  *  - State stores shard by the grouping key, so per-user session state and
  *    per-digest dedup state partition horizontally; the watermark bounds
  *    state size — without it both grow forever.
  *  - `session_window` is Spark's native gap-session operator (codegen'd,
  *    mergeable state) — preferred over a hand-rolled
  *    flatMapGroupsWithState for gap sessions; custom state remains the
  *    escape hatch for semantics the built-in can't express.
  */
object Streaming {

  /** Gap-based sessionization (the streaming form of `q_sessionize`):
    * per-user sessions closed after `gap` of event-time silence.
    * One state shuffle on (user_id); late events beyond `watermark` are
    * dropped and their sessions finalized.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 valueCol: String, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** Watermarked tumbling-window aggregate (the streaming form of
    * `q_events_daily`): events per (window, type). Partial aggregation is
    * map-side; only (window, type) keys shuffle.
    */
  def eventsPerWindow(events: DataFrame, tsCol: String, typeCol: String,
                      valueCol: String, window_ : String = "1 day",
                      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup (the streaming form of `Dedup.exactDuplicateGroups`
    * applied at ingest): first-seen row per text digest wins; duplicates
    * arriving within the watermark horizon are dropped. State is one
    * 16-byte digest per distinct text, sharded by digest — the streaming
    * analog of shuffling digests, never documents.
    */
  def dropDuplicateTexts(docs: DataFrame, textCol: String, tsCol: String,
                         watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming text-quality annotation: the batch `TextAnalysis` expressions
    * applied on a stream — stateless, so no watermark or shuffle at all;
    * demonstrates that every row-local batch operator is streaming-ready
    * as-is.
    */
  def annotateQuality(docs: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    docs
      .withColumn("n_tokens", graft.ext.TextAnalysis.tokenCount(text).cast("long"))
      .withColumn("quality", graft.ext.TextAnalysis.qualityScore(text))
      .withColumn("pred_lang", graft.ext.TextAnalysis.langId(text))
  }
}
