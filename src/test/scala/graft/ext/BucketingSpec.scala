package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Proof that storage bucketing actually removes the join shuffle: the same
  * equi-join is planned once over plain parquet relations (exchanges
  * present) and once over co-bucketed tables (zero exchanges), with
  * identical results. This is the measurable form of the SCALING.md claim
  * "co-locate repeated joins via bucketing".
  */
class BucketingSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val docs = (0L until 256L)
    .map(i => (i, s"text-$i", (i % 7).toString)).toDF("doc_id", "text", "lang")
  private lazy val scores = (0L until 256L)
    .map(i => (i, i * 0.5)).toDF("doc_id", "score")

  test("co-bucketed equi-join plans with ZERO shuffle exchanges") {
    Bucketing.writeBucketed(docs, "b_docs", buckets = 4, "doc_id")
    Bucketing.writeBucketed(scores, "b_scores", buckets = 4, "doc_id")
    val joined = spark.table("b_docs").join(spark.table("b_scores"), "doc_id")
      .select(col("doc_id"), col("lang"), col("score"))
    assert(joined.count() == 256L) // force execution so the plan is final
    assert(Bucketing.shuffleExchangeCount(joined) == 0,
      "bucketed join must not exchange:\n" + joined.queryExecution.executedPlan)

    // identical join over non-bucketed relations DOES shuffle (sanity: the
    // zero above is the bucketing, not the data size)
    val plain = docs.join(scores, "doc_id")
      .select(col("doc_id"), col("lang"), col("score"))
    // disable auto-broadcast so the comparison shows the shuffle bucketing removes
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val p = docs.join(scores, "doc_id")
        .select(col("doc_id"), col("lang"), col("score"))
      // BEFORE execution: exchanges are plain plan nodes
      assert(Bucketing.shuffleExchangeCount(p) > 0)
      // AFTER execution AQE replans them into ShuffleQueryStageExec LEAVES;
      // the counter must descend into query stages or it returns a false 0
      p.write.format("noop").mode("overwrite").save()
      assert(Bucketing.shuffleExchangeCount(p) > 0,
        "post-execution adaptive plan hid the exchanges")
    }
    // and the results agree
    assert(joined.orderBy("doc_id").collect().toSeq ==
      plain.orderBy("doc_id").collect().toSeq)
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    Bucketing.writeBucketed(docs, "b_docs_agg", buckets = 4, "doc_id")
    val agg = spark.table("b_docs_agg").groupBy("doc_id").agg(count(lit(1)))
    assert(agg.count() == 256L)
    assert(Bucketing.shuffleExchangeCount(agg) == 0,
      "groupBy on the bucket key must not exchange")
  }

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
