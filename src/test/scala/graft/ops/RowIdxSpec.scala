package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Determinism of the positional row index — the invariant every positional
  * join in the engine rests on. Regression for the round-5 bug: the index
  * was built from `repartitionByRange` + `spark_partition_id()`, whose
  * bounds are RE-SAMPLED on every evaluation of the exchange, so the two
  * subtrees of a positional self-join could disagree (the output was not
  * even a permutation unless ReusedExchange deduped them). The index must be
  * a pure function of row values: identical across arbitrarily many
  * independent evaluations.
  */
class RowIdxSpec extends SparkTestBase {

  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("rowidx-").toString + "/t.parquet"
    spark.range(0, 5000).select(
      col("id"),
      // a key whose sort order differs from file order
      ((col("id") * 2654435761L) % 100000L).as("k"))
      .write.parquet(dir)
    dir
  }

  test("file-order index equals file order, every evaluation (perm + stable)") {
    val df = spark.read.parquet(path)
    val fileOrder = df.select(col("id")).collect().map(_.getLong(0))
    for (_ <- 1 to 3) {
      val got = ColumnOps.withRowIdxByFileOrder(spark.read.parquet(path))
        .select(col("id"), col(ColumnOps.RowIdx))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.map(_._2).sorted.toSeq == (0L until 5000L)) // permutation
      val byIdx = got.sortBy(_._2).map(_._1)
      assert(byIdx.toSeq == fileOrder.toSeq) // == file order
    }
  }

  test("keyed index equals the key's sort rank, every evaluation") {
    val df = spark.read.parquet(path)
    val expected = df.select(col("k"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
      .zipWithIndex.map { case ((_, id), i) => id -> i.toLong }.toMap
    for (_ <- 1 to 3) {
      val got = ColumnOps.withRowIdxByKey(
          spark.read.parquet(path), col("k"), col("id"))
        .select(col("id"), col(ColumnOps.RowIdx))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got.size == 5000)
      assert(got == expected)
    }
  }

  test("positional self-join alignment: mask via two index evaluations agrees") {
    // the q_runner_slice failure shape: one subtree computes the data frame's
    // index, another the mask column's — they must land on the same rows
    val base = ColumnOps.withRowIdxByFileOrder(spark.read.parquet(path))
    val maskCol = base.select(col(ColumnOps.RowIdx), (col("k") % 3 === 0).as("m"))
    val expected = spark.read.parquet(path).filter(col("k") % 3 === 0)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    for (_ <- 1 to 3) {
      val kept = base.join(maskCol, ColumnOps.RowIdx).filter(col("m"))
        .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == expected)
    }
  }
}
