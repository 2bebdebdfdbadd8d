package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Co-located joins via storage bucketing — the shuffle-elimination lever
  * for the REPEATED big-join workloads of a training-data pipeline (dedup
  * pairs re-joined to documents per run, contamination joined per benchmark
  * refresh, embeddings joined to labels per probe sweep). Writing both
  * sides `bucketBy(n, key)` once means every subsequent equi-join on that
  * key reads pre-co-located buckets: ZERO exchange in the join plan, at any
  * scale, for every query that reuses the layout. At 100 TB the one-time
  * bucketed write replaces a per-query shuffle of the full corpus — the
  * break-even is the second join.
  *
  * `sortBy` on the same key additionally lets sort-merge join skip its sort.
  *
  * This module is deliberately thin — the capability is Spark's; what the
  * engine contributes is the LAYOUT CONTRACT (same key, same bucket count on
  * both sides) and a measurable way to verify the exchange really vanished
  * ([[shuffleExchangeCount]], asserted in BucketingSpec).
  */
object Bucketing {

  /** Persist `df` as a bucketed (and bucket-sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, moreKeys: String*): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.write
      .format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Number of shuffle exchanges in the EXECUTED physical plan. Descends
    * into every adaptive wrapper: `AdaptiveSparkPlanExec.executedPlan`, and
    * — crucially — `QueryStageExec.plan`, because after AQE replanning an
    * exchange becomes a ShuffleQueryStageExec LEAF whose `children` is Nil
    * (a naive child walk returns a false 0 for any post-execution plan).
    * The bucketed-join contract is `shuffleExchangeCount == 0`. */
  def shuffleExchangeCount(df: DataFrame): Int = {
    def count(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case q: QueryStageExec => count(q.plan)
        case _ => 0
      }
      self + inner + p.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }
}
