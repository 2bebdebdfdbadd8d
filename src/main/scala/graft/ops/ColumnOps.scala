package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core column algebra of the engine — the Spark-first re-expression of the
  * reference's ephemeral column ops (krnel-graph `dataset_ops.py`).
  *
  * Design: the reference aligns columns *positionally* (same source dataset ⇒
  * same row order; see reference `local_arrow_runner.py:818-836` length
  * checks). In Spark, relations are unordered, so ops that need positional
  * identity take an explicit, deterministic row index (`rowIdx`) derived
  * either from a key ordering (preferred — survives any repartitioning at
  * 100 TB) or `zipWithIndex` at load for keyless sources. Ops that combine
  * columns from the *same* lineage are pure `Column` expressions — zero
  * joins, zero shuffles, fully codegen'd — which is the fused fast path the
  * runner uses for chains of ephemeral ops.
  */
object ColumnOps {

  val RowIdx = "__row_idx"

  /** Deterministic 0-based row index from an explicit total ordering —
    * scale-safe two-phase construction (no single-partition window):
    *
    *   1. range-partition on the keys (partition i holds keys < partition
    *      i+1; bounds are sample-derived but deterministic for a fixed
    *      input),
    *   2. per-partition local rank via a window PARTITIONED by
    *      `spark_partition_id()` (parallel, no data movement to one node),
    *   3. per-partition counts → prefix-sum offsets over the tiny
    *      (numPartitions-row) aggregate, broadcast-joined back.
    *
    * global_idx = partition_offset + local_rank. This is the distributed
    * zipWithIndex shape expressed in pure DataFrame ops, so the plan stays
    * in Catalyst (pushdown/codegen survive) and works at any scale.
    */
  def withRowIdxByKey(df: DataFrame, keys: Column*): DataFrame = {
    val np = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pid = "__gp_pid"; val lrn = "__gp_lrn"; val off = "__gp_off"
    val parted = df.repartitionByRange(np, keys: _*).withColumn(pid, spark_partition_id())
    val local = parted.withColumn(lrn,
      row_number().over(Window.partitionBy(col(pid)).orderBy(keys: _*)).cast("long"))
    // prefix sum over the numPartitions-row counts table via a self
    // inequality-join (not a global window — keeps the plan free of
    // single-partition WindowExec even for this metadata-sized step)
    val counts = parted.groupBy(col(pid)).agg(count(lit(1)).as("__gp_cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.as("b")), col(s"b.$pid") < col(s"a.$pid"), "left")
      .groupBy(col(s"a.$pid").as(pid))
      .agg(coalesce(sum(col("b.__gp_cnt")), lit(0L)).as(off))
    local.join(broadcast(offsets), pid)
      .withColumn(RowIdx, col(off) + col(lrn) - 1)
      .drop(pid, lrn, off)
  }

  /** Deterministic 0-based row index in file order — for keyless sources
    * (reference: positional identity of a loaded parquet,
    * `local_arrow_runner.py:500-512`).
    *
    * Pure-DataFrame construction: `monotonically_increasing_id()` is
    * (partitionId << 33 | offset), so ranking those ids with the two-phase
    * index reproduces file order WITHOUT the rdd.zipWithIndex hop the
    * round-1 engine used. Staying inside Catalyst matters more than the
    * extra range shuffle: column pruning and predicate pushdown from
    * downstream ops now reach the parquet scan (an RDD boundary is a
    * pruning fence, so zipWithIndex forced full-width reads), and the
    * shuffle carries only the columns the query actually consumes.
    */
  def withRowIdxByFileOrder(df: DataFrame): DataFrame = {
    val mid = "__gp_mid"
    withRowIdxByKey(df.withColumn(mid, monotonically_increasing_id()), col(mid))
      .drop(mid)
  }

  /** TakeRowsOp (reference `dataset_ops.py:222-230`): python slice
    * `table[offset::skip][:num_rows]` re-expressed over the row index.
    * The limit keeps the plan a pushed-down filter + local limit.
    */
  def takeRows(df: DataFrame, skip: Int = 1, offset: Int = 0,
               numRows: Option[Int] = None): DataFrame = {
    require(skip >= 1, s"skip must be >= 1, got $skip")
    val sliced = df.filter(
      (col(RowIdx) >= offset) && ((col(RowIdx) - offset) % skip === 0))
    numRows match {
      case Some(n) =>
        // keep deterministic: first n in row-index order
        sliced.orderBy(col(RowIdx)).limit(n)
      case None => sliced
    }
  }

  /** CategoryToBooleanOp (reference `dataset_ops.py:248-316`):
    * membership of a categorical column in `trueValues`.
    * With both sets given, rows outside the union are invalid (hard error in
    * the reference — here `validateCategoryUniverse` performs that check).
    * With only `falseValues`, result is the negated membership.
    */
  def categoryToBoolean(c: Column, trueValues: Set[String],
                        falseValues: Option[Set[String]] = None): Column =
    if (trueValues.nonEmpty) c.isin(trueValues.toSeq.sorted: _*)
    else falseValues match {
      case Some(fv) => !c.isin(fv.toSeq.sorted: _*)
      case None => throw new IllegalArgumentException(
        "one of trueValues/falseValues required")
    }

  /** The reference's subset validation: observed values must be within
    * true ∪ false (`dataset_ops.py:281-301`). Distributed: an any()
    * aggregate, no collect of data.
    */
  def validateCategoryUniverse(df: DataFrame, c: Column,
                               universe: Set[String]): Unit = {
    val bad = df.filter(!c.isin(universe.toSeq: _*) && c.isNotNull).limit(1).count()
    if (bad > 0) throw new IllegalArgumentException(
      s"categorical column contains values outside ${universe.toSeq.sorted}")
  }

  /** BooleanLogicOp (reference `dataset_ops.py:319-346`). */
  def booleanLogic(operation: String, l: Column, r: Column): Column =
    operation match {
      case "and" => l && r
      case "or"  => l || r
      case "xor" => l =!= r
      case "not" => !l
      case other => throw new IllegalArgumentException(s"bad op $other")
    }

  /** PairwiseArithmeticOp (reference `dataset_ops.py:353-379`) with numpy
    * semantics for division: x/0 → ±Infinity, 0/0 → NaN (numpy errstate
    * ignored — reference `local_arrow_runner.py:744-747`). Spark's `/`
    * yields null on zero divisor (non-ANSI), so divide is special-cased.
    */
  def pairwiseArithmetic(operation: String, l: Column, r: Column): Column =
    operation match {
      case "add"      => l + r
      case "subtract" => l - r
      case "multiply" => l * r
      case "divide" =>
        when(r === 0.0,
          when(l > 0, lit(Double.PositiveInfinity))
            .when(l < 0, lit(Double.NegativeInfinity))
            .otherwise(lit(Double.NaN)))
          .otherwise(l.cast("double") / r.cast("double"))
      case other => throw new IllegalArgumentException(s"bad op $other")
    }

  /** VectorToScalarOp (reference `dataset_ops.py:348-351`): element
    * `colIndex` (0-based, reference convention) of each vector.
    * Spark `element_at` is 1-based.
    */
  def vectorToScalar(vec: Column, colIndex: Int): Column =
    element_at(vec, colIndex + 1)

  /** Bounds check for vectorToScalar (reference
    * `local_arrow_runner.py:688-719`): index must be < min vector length.
    */
  def validateVectorIndex(df: DataFrame, vec: Column, colIndex: Int): Unit = {
    val minLen = df.agg(min(size(vec))).head().getInt(0)
    if (colIndex < 0 || colIndex >= minLen) throw new IndexOutOfBoundsException(
      s"col_index $colIndex out of bounds for vectors of min length $minLen")
  }

  /** AssignTrainTestSplitOp (reference `dataset_ops.py:168-184`,
    * `local_arrow_runner.py:538-620`): seeded *exact-count* random
    * assignment. float proportion ⇒ test = ceil(p*n) (reference:
    * `local_arrow_runner.py:567-572`), int ⇒ absolute count; the complement
    * is inferred. Deterministic for a given seed *within this engine* (RNG
    * differs from CPython's `random.sample` — documented contract,
    * SURVEY §7.4.3).
    *
    * Distributed: `rand(seed)` is deterministic per partition+offset for a
    * fixed partitioning; exact count needs a global rank — built with the
    * scale-safe two-phase index over the draw (`withRowIdxByKey`), never a
    * single-partition window. The total row count is folded into the same
    * plan as a broadcast 1-row aggregate (no eager driver-side `count()`),
    * so the whole op is one lazy DataFrame.
    */
  def assignTrainTestSplit(df: DataFrame, testFraction: Option[Double],
                           testCount: Option[Int], seed: Long): DataFrame = {
    testFraction.foreach(p =>
      require(p >= 0 && p <= 1, s"test proportion $p out of [0,1]"))
    val ranked = withRowIdxByKey(df.withColumn("__draw", rand(seed)), col("__draw"))
    val total = ranked.agg(count(lit(1)).as("__n"))
    val nTestCol: Column = (testFraction, testCount) match {
      case (Some(p), None) => ceil(lit(p) * col("__n")).cast("long")
      case (None, Some(c)) => lit(c.toLong)
      case _               => ceil(lit(0.25) * col("__n")).cast("long") // reference default
    }
    ranked.crossJoin(broadcast(total))
      .withColumn("split",
        when(col(RowIdx) < nTestCol, "test").otherwise("train"))
      .drop("__draw", "__n", RowIdx)
  }

  /** AssignRowIDOp (declared but unimplemented in the reference,
    * `dataset_ops.py:161-166`) — here implemented as the deterministic
    * row index, exposed as a column.
    */
  def assignRowId(df: DataFrame, orderKeys: Column*): DataFrame =
    if (orderKeys.nonEmpty) withRowIdxByKey(df, orderKeys: _*).withColumnRenamed(RowIdx, "row_id")
    else withRowIdxByFileOrder(df).withColumnRenamed(RowIdx, "row_id")

  /** MaskRowsOp (reference `dataset_ops.py:233-245`) for the *fused* case:
    * mask is an expression over the same lineage ⇒ a plain filter
    * (predicate-pushdown friendly). The runner handles the cross-dataset
    * case with a `__row_idx` equi-join.
    */
  def maskRows(df: DataFrame, mask: Column): DataFrame = df.filter(mask)

}
