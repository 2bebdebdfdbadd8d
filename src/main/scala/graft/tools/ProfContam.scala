// temp decomposition probe
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Corpus
object ProfContam {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[prof] $label%-30s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("warmup-scan")(docs)
    time("words-only")(docs.select(Corpus.words(col("text")).as("w")))
    time("ngrams5")(docs.select(Corpus.wordNgrams(col("text"), 5).as("g")))
    time("ngrams5-hashed-distinct")(docs.select(col("doc_id"),
      array_distinct(transform(Corpus.wordNgrams(col("text"), 5), g => xxhash64(g))).as("g")))
    time("ngrams5-exploded")(docs.select(col("doc_id"),
      explode(array_distinct(transform(Corpus.wordNgrams(col("text"), 5), g => xxhash64(g)))).as("g")))
    time("ngram-hashes")(docs.select(Corpus.wordNgramHashes(col("text"), 5).as("g")))
    time("ngram-hashes-distinct")(docs.select(
      array_distinct(Corpus.wordNgramHashes(col("text"), 5)).as("g")))
    val bench = docs.filter(col("doc_id") % 20 === 0)
    time("full-contam")(Corpus.contamination(docs, bench, "text", "doc_id", 5))
    time("full-contam-again")(Corpus.contamination(docs, bench, "text", "doc_id", 5))
    spark.stop()
  }
}
