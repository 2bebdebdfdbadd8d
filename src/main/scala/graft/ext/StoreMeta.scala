package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic single-row metadata commits for the stored-index family
  * ([[Bm25]] stats, [[Dedup]] MinHash meta).
  *
  * The one-row pointer table IS each store's commit point, so it must
  * never be half-written or transiently missing. A plain
  * `mode("overwrite")` parquet write is neither: Spark deletes the whole
  * directory before writing, so a probe racing the flip can observe a
  * MISSING pointer, and a crash between the delete and the commit
  * destroys the only copy (this was ADVICE r16's medium finding).
  *
  * The discipline here is versioned-directory + commit-marker, the same
  * one Spark's own FileOutputCommitter gives every job for free:
  *
  *  - a writer never touches an existing version: it writes the new row
  *    to a FRESH `&lt;prefix&gt;_m&lt;K+1&gt;` directory; the `_SUCCESS`
  *    marker (written by the committer AFTER every data file is in place)
  *    is the version's atomic commit;
  *  - a reader lists the versions and reads the HIGHEST COMMITTED one —
  *    a crashed attempt has no `_SUCCESS` and is invisible; the previous
  *    version is still whole until the next writer prunes it;
  *  - pruning keeps the current AND previous committed versions (the
  *    one-writer-cycle grace window the data-table flips already use, see
  *    [[Bm25]] `pruneVersions`), so an in-flight reader that resolved the
  *    old pointer just before a flip can finish its read.
  *
  * Single writer per store (the family's standing contract); readers are
  * unlimited and never blocked.
  */
object StoreMeta {

  private val Marker = "_SUCCESS"

  private def fsOf(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** (version, committed?) of every `prefix_mK` dir under `root`. */
  private def versions(spark: SparkSession, root: String,
                       prefix: String): Seq[(Int, Boolean)] = {
    val (fs, p) = fsOf(spark, root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (s.isDirectory && n.startsWith(s"${prefix}_m"))
        scala.util.Try(n.stripPrefix(s"${prefix}_m").toInt).toOption
          .map(v => (v, fs.exists(
            new org.apache.hadoop.fs.Path(s.getPath, Marker))))
      else None
    }
  }

  /** Highest COMMITTED version, or -1 if none exists. */
  def currentVersion(spark: SparkSession, root: String,
                     prefix: String): Int =
    versions(spark, root, prefix).collect { case (v, true) => v }
      .foldLeft(-1)(math.max)

  /** The current committed metadata row(s) as a DataFrame. Loud error if
    * the store has no committed version (never initialized, or a foreign
    * directory). */
  def read(spark: SparkSession, root: String, prefix: String): DataFrame = {
    val v = currentVersion(spark, root, prefix)
    require(v >= 0,
      s"StoreMeta.read: no committed ${prefix}_m<K> under $root — " +
        "not an initialized store")
    spark.read.parquet(s"$root/${prefix}_m$v")
  }

  /** Commit `df` as the next version and prune everything older than the
    * previous committed version (plus crashed-attempt debris). The commit
    * point is the new directory's `_SUCCESS`; nothing existing is
    * modified before it lands. */
  def write(df: DataFrame, root: String, prefix: String): Unit = {
    val spark = df.sparkSession
    val vs = versions(spark, root, prefix)
    val newV = vs.map(_._1).foldLeft(-1)(math.max) + 1
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$root/${prefix}_m$newV")
    // The marker is the commit point, so it must not depend on committer
    // configuration: with mapreduce.fileoutputcommitter.marksuccessfuljobs
    // =false (a common object-store setting) the committer writes no
    // _SUCCESS, every version would look uncommitted, read() would error,
    // and the prune below would delete the only good pointers as
    // "crashed attempts". Write it explicitly AFTER the data files land —
    // idempotent when the committer already created it.
    val (fsW, _) = fsOf(spark, root)
    fsW.create(new org.apache.hadoop.fs.Path(
      s"$root/${prefix}_m$newV/$Marker"), true).close()
    // prune: keep newV and the previous committed version; delete older
    // committed versions and any uncommitted (crashed) attempt dirs
    val (fs, _) = fsOf(spark, root)
    val prevCommitted = vs.collect { case (v, true) => v }
      .foldLeft(-1)(math.max)
    vs.foreach { case (v, committed) =>
      if ((committed && v < prevCommitted) || (!committed && v < newV)) {
        try fs.delete(
          new org.apache.hadoop.fs.Path(s"$root/${prefix}_m$v"), true)
        catch { case _: Exception => () }
      }
    }
  }
}
