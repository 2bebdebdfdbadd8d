package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, re-expressed with the operators
  * it has — no custom physical nodes needed, both stay fully inside
  * Catalyst/codegen.
  *
  * Scale framing (1000 executors):
  *  - `asofJoin` is ONE shuffle of both sides on the key, then a running
  *    `last(ignoreNulls)` window per key — the state is O(#right-value
  *    columns) per key regardless of history length. A naive
  *    `l JOIN r ON key AND r.ts <= l.ts` + max() is a range join that
  *    explodes to every (left, earlier-right) pair before pruning; this
  *    form never materializes those pairs.
  *  - `rangeJoinBinned` replaces the cross-product a plain inequality join
  *    plans (BroadcastNestedLoopJoin at best) with an equi-join on
  *    (key, time-bin): intervals explode to the bins they cover, points
  *    carry their single containing bin, so each qualifying pair meets in
  *    exactly one bin — no post-join dedup. Bin width trades explode factor
  *    (interval_len / width bins per interval) against bucket selectivity;
  *    pick it near the typical interval length.
  */
object Joins {

  /** As-of (point-in-time) join: for every left row, the LATEST right row
    * with `right.ts <= left.ts` on the same key — nulls where no right row
    * precedes. The union-window form: tag sides, union, one window
    * partitioned by key ordered by (ts, side, right-row struct) with right
    * rows sorting before left rows at equal ts (an equal-timestamp right
    * row is visible), a running `last(ignoreNulls)` fills the matched right
    * row forward, keep left rows.
    *
    * The right values travel as ONE STRUCT, filled atomically: filling each
    * value column independently would, when a matched right row carries a
    * genuine NULL in one column, tear values from DIFFERENT right rows into
    * one output row. The struct also serves as the deterministic tiebreak
    * for right rows sharing (key, ts) — Spark orders structs field-wise, so
    * the winner is the field-wise-greatest right row (ties only remain for
    * fully identical right rows, where the choice is indistinguishable).
    *
    * `rightVals` columns must not collide with left column names (alias on
    * the way in).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"right value columns ${rightVals.intersect(leftCols)} collide with left")
    val ts = "__asof_ts"; val side = "__asof_side"; val rv = "__asof_rv"
    val l = left.withColumn(ts, col(leftTs)).withColumn(side, lit(1))
      .withColumn(rv, lit(null).cast(org.apache.spark.sql.types.StructType(
        rightVals.map(v => org.apache.spark.sql.types.StructField(
          v, right.schema(v).dataType)))))
    val r0 = right.select(
        (keys.map(col) :+ col(rightTs).as(ts)) ++ rightVals.map(col): _*)
      .withColumn(side, lit(0))
      .withColumn(rv, struct(rightVals.map(col): _*))
    val rPadded = leftCols.filterNot(c => keys.contains(c))
      .foldLeft(r0)((d, c) =>
        d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val shape = (leftCols.map(col) :+ col(ts) :+ col(side)) :+ col(rv)
    val unioned = l.select(shape: _*).unionByName(rPadded.select(shape: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side), col(rv))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn(rv, last(col(rv), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col(s"$rv.$v").as(v)): _*)
  }

  /** Points-to-intervals range join via time binning: emit each
    * (interval key, covered bin) and equi-join against (point key, its
    * bin), then verify `start <= pt < end` exactly. Returns matched pairs:
    * all interval columns + all point columns. Ts columns must be NUMERIC
    * (for timestamps, `unix_micros` them first — a plain timestamp→long
    * cast silently truncates to seconds); `binWidth` in the same unit.
    */
  def rangeJoinBinned(points: DataFrame, ptTs: String,
                      intervals: DataFrame, startTs: String, endTs: String,
                      keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!Seq(startTs, endTs).contains(ptTs),
      "point and interval ts column names must differ")
    val bin = "__rj_bin"
    val p = points.withColumn(bin, floor(col(ptTs) / binWidth).cast("long"))
    // end is EXCLUSIVE: an interval touching a bin boundary exactly does
    // not cover the next bin. Empty/inverted intervals (end <= start) can
    // match no point, but left unfiltered they'd make sequence() count
    // DOWNWARD (Spark generates descending sequences when start > stop) —
    // one far-inverted row would explode into a huge bin array.
    val i = intervals.filter(col(endTs) > col(startTs)).withColumn(bin, explode(sequence(
      floor(col(startTs) / binWidth).cast("long"),
      floor((col(endTs) - 1) / binWidth).cast("long"))))
    i.join(p, keys :+ bin)
      .filter(col(ptTs) >= col(startTs) && col(ptTs) < col(endTs))
      .drop(bin)
  }
}
