package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Structured Streaming operators driven through MemoryStream: the same
  * transform functions are applied to a streaming and a batch frame and must
  * agree (the engine's batch/streaming parity contract).
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minutes: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2026, 1, 1, 0, 0).plusMinutes(minutes.toLong))

  test("streaming sessionize: gap sessions match the batch form") {
    val rows = Seq(
      ("u1", ts(0), 1.0), ("u1", ts(10), 2.0), // session 1: 2 events
      ("u1", ts(50), 4.0),                     // >30m gap → session 2
      ("u2", ts(5), 8.0))                      // own key → own session
    val input = MemoryStream[(String, Timestamp, Double)]
    val sessions = Streaming.sessionize(
      input.toDF.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
    val q = sessions.writeStream.format("memory")
      .queryName("sess").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("sess")
        .select("user_id", "n_events", "session_value")
        .orderBy("user_id", "session_value")
        .as[(String, Long, Double)].collect().toSeq
      assert(got == Seq(("u1", 2L, 3.0), ("u1", 1L, 4.0), ("u2", 1L, 8.0)))

      // batch parity: the same function on a batch frame, same sessions
      val batch = Streaming.sessionize(
        rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
        .select("user_id", "n_events", "session_value")
        .orderBy("user_id", "session_value")
        .as[(String, Long, Double)].collect().toSeq
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming windowed aggregate matches batch") {
    val rows = Seq(
      ("click", ts(1), 1.0), ("click", ts(30), 2.0),  // same 1h window
      ("view", ts(5), 5.0),
      ("click", ts(90), 4.0))                          // next window
    val input = MemoryStream[(String, Timestamp, Double)]
    val agg = Streaming.eventsPerWindow(
      input.toDF.toDF("event_type", "ts", "value"), "ts", "event_type", "value",
      window_ = "1 hour")
    val q = agg.writeStream.format("memory")
      .queryName("winagg").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("winagg")
        .select("window_start", "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
        .as[(Timestamp, String, Long, Double)].collect().toSeq
      assert(got == Seq(
        (ts(0), "click", 2L, 3.0), (ts(0), "view", 1L, 5.0),
        (ts(60), "click", 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming exact dedup: first-seen text wins within the watermark") {
    val input = MemoryStream[(Long, String, Timestamp)]
    val deduped = Streaming.dropDuplicateTexts(
      input.toDF.toDF("doc_id", "text", "ts"), "text", "ts")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup").outputMode("append").start()
    try {
      input.addData((1L, "alpha", ts(0)), (2L, "alpha", ts(1)), (3L, "beta", ts(0)))
      q.processAllAvailable()
      // a duplicate arriving in a LATER micro-batch is still dropped (state)
      input.addData((4L, "alpha", ts(2)), (5L, "gamma", ts(2)))
      q.processAllAvailable()
      val got = spark.table("dedup").select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      assert(got.values.toSeq.sorted == Seq("alpha", "beta", "gamma"))
      assert(got.keySet.intersect(Set(2L, 4L)).isEmpty) // dup rows dropped
    } finally q.stop()
  }

  test("stateless text analysis runs on a stream as-is") {
    val input = MemoryStream[(Long, String)]
    val annotated = Streaming.annotateQuality(
      input.toDF.toDF("doc_id", "text"), "text")
    val q = annotated.writeStream.format("memory")
      .queryName("qual").outputMode("append").start()
    try {
      input.addData((1L, "The quick brown fox jumps over the lazy dog."),
        (2L, "der und die das ist nicht ein eine mit von"))
      q.processAllAvailable()
      val got = spark.table("qual")
        .select("doc_id", "n_tokens", "pred_lang")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, 9L, "en"), (2L, 10L, "de")))
    } finally q.stop()
  }
}
