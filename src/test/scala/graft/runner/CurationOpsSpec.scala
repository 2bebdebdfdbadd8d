package graft.runner

import graft.SparkTestBase
import graft.spec._

/** The scale-extension curation ops as spec-layer citizens: redaction,
  * exact dedup, contamination flags, stratified sampling — materialized
  * through the memoizing runner, with positional re-indexing and graph
  * serde checked like any reference op.
  */
class CurationOpsSpec extends SparkTestBase {

  private def newRunner() = new LocalSparkRunner(spark, newStoreDir())

  private val corpus = LoadInlineJsonDatasetOp(Map(
    "text" -> Seq(
      "alpha beta gamma delta epsilon",   // 0
      "unique words here only",           // 1
      "alpha beta gamma delta epsilon",   // 2: exact dup of 0
      "contact me at bob@x.io please",    // 3
      "alpha beta gamma delta epsilon"),  // 4: exact dup of 0
    "lang" -> Seq("en", "en", "en", "fr", "fr")))

  test("RedactPIIColumnOp: ephemeral, fused, redacts") {
    val r = newRunner()
    val red = RedactPIIColumnOp(SelectTextColumnOp(corpus, "text"))
    assert(red.isEphemeral)
    val vals = r.toFrame(red).orderBy("__row_idx")
      .collect().map(_.getAs[String]("value"))
    assert(vals(3) == "contact me at <EMAIL> please")
    assert(vals(0) == "alpha beta gamma delta epsilon")
    // ephemeral: nothing persisted for the redaction itself
    assert(!r.isDone(red))
  }

  test("DropExactDuplicatesOp: first copy survives, contiguous re-index") {
    val r = newRunner()
    val dedup = DropExactDuplicatesOp(corpus, SelectTextColumnOp(corpus, "text"))
    val rows = r.toFrame(dedup).orderBy("__row_idx").collect()
    assert(rows.map(_.getAs[String]("text")).toSeq == Seq(
      "alpha beta gamma delta epsilon",
      "unique words here only",
      "contact me at bob@x.io please"))
    assert(rows.map(_.getAs[Long]("__row_idx")).toSeq == Seq(0L, 1L, 2L))
    assert(r.lengthOf(dedup) == 3L)
    // memoized: second pull is a store read, not a recompute
    assert(r.hasResult(dedup))
  }

  test("ContaminationFlagOp: overlap vs benchmark column, threshold") {
    val r = newRunner()
    val bench = LoadInlineJsonDatasetOp(Map(
      "text" -> Seq("beta gamma delta")))
    val flag = ContaminationFlagOp(
      SelectTextColumnOp(corpus, "text"),
      SelectTextColumnOp(bench, "text"), n = 3L)
    val vals = r.toFrame(flag).orderBy("__row_idx")
      .collect().map(_.getAs[Boolean]("value"))
    // docs 0/2/4 contain "beta gamma delta"; 1 and 3 do not
    assert(vals.toSeq == Seq(true, false, true, false, true))
    // length is structural — no count job needed
    assert(r.lengthOf(flag) == 5L)
    val strict = ContaminationFlagOp(
      SelectTextColumnOp(corpus, "text"),
      SelectTextColumnOp(bench, "text"), n = 3L, minOverlap = 2L)
    assert(r.toFrame(strict).orderBy("__row_idx")
      .collect().map(_.getAs[Boolean]("value")).toSeq ==
      Seq(false, false, false, false, false))
  }

  test("StratifiedSampleOp: exact per-stratum counts, deterministic, re-indexed") {
    val r = newRunner()
    val big = LoadInlineJsonDatasetOp(Map(
      "v" -> (0 until 100).map(_.toString),
      "lang" -> (0 until 100).map(i => if (i < 60) "en" else "fr")))
    val samp = StratifiedSampleOp(big,
      SelectCategoricalColumnOp(big, "lang"), frac = 0.25)
    val rows = r.toFrame(samp).orderBy("__row_idx").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    assert(byLang.toMap == Map("en" -> 15, "fr" -> 10))
    // contiguous positional re-index
    assert(rows.map(_.getAs[Long]("__row_idx")).toSeq == (0L until 25L))
    // deterministic across a fresh runner (identity = spec, not session)
    val r2 = new LocalSparkRunner(spark, newStoreDir())
    val again = r2.toFrame(StratifiedSampleOp(big,
      SelectCategoricalColumnOp(big, "lang"), frac = 0.25))
      .orderBy("__row_idx").collect().map(_.getAs[String]("v")).toSeq
    assert(again == rows.map(_.getAs[String]("v")).toSeq)
    // different salt → different rows, same counts
    val salted = r.toFrame(StratifiedSampleOp(big,
      SelectCategoricalColumnOp(big, "lang"), frac = 0.25, salt = "other"))
      .collect()
    assert(salted.length == 25)
    assert(salted.map(_.getAs[String]("v")).toSeq != again)
  }

  test("spec validation errors") {
    intercept[IllegalArgumentException] {
      StratifiedSampleOp(corpus, SelectCategoricalColumnOp(corpus, "lang"), 1.5)
    }
    intercept[IllegalArgumentException] {
      ContaminationFlagOp(SelectTextColumnOp(corpus, "text"),
        SelectTextColumnOp(corpus, "text"), n = 0L)
    }
  }

  test("graph serde round-trips the curation ops with stable uuids") {
    val dedup = DropExactDuplicatesOp(corpus, SelectTextColumnOp(corpus, "text"))
    val samp = StratifiedSampleOp(dedup,
      SelectCategoricalColumnOp(dedup, "lang"), frac = 0.5, salt = "s1")
    val flag = ContaminationFlagOp(
      RedactPIIColumnOp(SelectTextColumnOp(samp, "text")),
      SelectTextColumnOp(corpus, "text"), n = 4L, minOverlap = 2L)
    val back = Graph.deserialize(Graph.serialize(flag)).last
    assert(back == flag)
    assert(back.uuid == flag.uuid)
  }
}
