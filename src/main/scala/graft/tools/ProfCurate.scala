package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.concurrent.TrieMap
object ProfCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val njobs = new AtomicInteger(0)
    val starts = TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        njobs.incrementAndGet()
        val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), desc.take(60))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        starts.get(je.jobId).foreach { case (t0, d) =>
          val s = (System.nanoTime() - t0) / 1e9
          if (s > 0.15) println(f"[job] ${je.jobId}%4d ${s}%6.2f s  $d")
        }
      }
    })
    // warmup shared subsystems
    graft.SparkEntry.queries("q_load_parquet")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    val base = njobs.get()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q_curate_pipeline")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    println(f"[prof] curate cold: ${(System.nanoTime()-t0)/1e9}%.2f s, jobs: ${njobs.get()-base}")
    spark.stop()
  }
}
