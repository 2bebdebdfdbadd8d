package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only 10x scale probe: replicates the given sf dir's inputs to ~10×
  * volumes and runs the scale-sensitive operators, as evidence for
  * SCALING.md claims. Usage: `runMain graft.ScaleProbe [sfDir]`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // 6M-row two-phase row index + slice
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val li10 = (0 until 10).map(i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
      .reduce(_ union _)
    time("row-idx + slice over 6M rows") {
      val idx = graft.ops.ColumnOps.withRowIdxByKey(li10, col("l_orderkey"), col("l_linenumber"))
      println("  kept=" + graft.ops.ColumnOps.takeRows(idx, skip = 1000, offset = 7).count())
    }
    // 50k-doc minhash LSH + verify
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val docs10 = (0 until 10).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ union _)
    time("minhash near-dup over 50k docs") {
      println("  pairs=" + graft.ext.Dedup.minhashNearDuplicates(
        docs10, "text", "doc_id", shingleN = 3, threshold = 0.5).count())
    }
    time("simhash near-dup over 50k docs") {
      println("  pairs=" + graft.ext.Dedup.simhashNearDuplicates(
        docs10, "text", "doc_id", maxHamming = 8).count())
    }
    // 50k-vector cosine LSH
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val emb10 = (0 until 10).map(i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ union _)
    time("cosine LSH over 50k vectors") {
      println("  pairs=" + graft.ext.Dedup.cosineNearDuplicates(
        emb10.select(col("vec_id"), col("embedding")), "embedding", "vec_id",
        dim = 64, threshold = 0.8).count())
    }
    // ~1M-event temporal joins (10x replicated events, shifted user ids so
    // key cardinality scales with volume — bucket population stays flat)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts").cast("long") / 1000L).cast("long")))
    val ev10 = (0 until 10).map(i =>
      ev.withColumn("user_id", col("user_id") + lit(i * 1000000L))
        .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
      .reduce(_ union _)
    time("as-of join over ~1M events") {
      val clicks = ev10.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev10.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      println("  rows=" + graft.ext.Joins.asofJoin(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("purchase_id")).count())
    }
    time("range join over ~1M events") {
      val clicks = ev10.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("click_us"))
      val purchases = ev10.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("start_us"),
          (unix_micros(col("ts")) + 3600000000L).as("end_us"))
      println("  pairs=" + graft.ext.Joins.rangeJoinBinned(clicks, "click_us",
        purchases, "start_us", "end_us", Seq("user_id"), 3600000000L).count())
    }
    // 320k-vector single-pass probe training aggregation
    time("difference-of-means weights over 320k vectors") {
      println("  dims=" + graft.ml.DiffOfMeans.weightsExact(
        emb10, col("embedding"), col("label") <= 4).count())
    }
    // 50k real codec round trips: encode + decode + resize + embed, all
    // narrow — scaling is pure CPU spread (the fixture id shuffle is 8-byte
    // longs), evidence for the multimodal rows of SCALING.md
    val ids10 = (0 until 10).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id")))
      .reduce(_ union _)
    time("image decode+resize+embed over 50k real payloads") {
      val imgs = graft.ext.Multimodal.synthImages(ids10, "doc_id", pngOnly = true)
      println("  rows=" + graft.ext.Multimodal.withResizedImage(
        imgs, "doc_id", "img", maxSide = 64).count())
    }
    time("WAV parse over 50k real payloads") {
      println("  rows=" + graft.ext.Multimodal.withAudioMeta(
        graft.ext.Multimodal.synthWavs(ids10, "doc_id"), "doc_id", "audio").count())
    }
    spark.stop()
  }
}
