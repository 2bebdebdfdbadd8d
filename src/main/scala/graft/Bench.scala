package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Two-pass steady-state protocol (round 9): a single cold pass smears
    // one-time JVM costs — classloading, first-use codegen, JIT warmup —
    // onto whichever query touches each subsystem first, and WHICH query
    // pays varies run to run (the round-8 record carried ~30 s of such
    // noise: q1_agg 21.5 s official vs 1.07 s on re-run). Pass 1 runs every
    // query once, untimed-for-the-headline but recorded (cold_total); pass
    // 2 re-runs everything in the warmed JVM and is the headline. Between
    // passes the runner store is RESET: memoized results must not turn
    // runner-backed queries into `done`-marker cache hits — steady-state
    // here means warm JVM + cold store, i.e. the queries really execute.
    def runPass(): Map[String, Double] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink: forces full evaluation of every output column (a bare
        // count() lets Catalyst prune all projections, which under-measured
        // narrow-transform queries in round 1)
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
        // -1 sentinel keeps failures visible in the JSON (a broken query
        // must not read as a round-over-round speedup)
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }

    val cold = runPass()
    SparkEntry.resetRunner(spark)
    val steady = runPass()

    // 10ms per-query precision, trailing zeros stripped: the driver keeps
    // only a 2000-char tail of this process' output, and at 82 queries the
    // one-line JSON presses against that limit (head-truncated JSON →
    // parsed:null in early rounds)
    def fmt(v: Double, dp: Int): String = {
      val r = BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_EVEN)
      r.bigDecimal.stripTrailingZeros.toPlainString
    }
    // 0.1s per query: 82 quoted names already dominate the line; finer
    // precision is what Profile is for
    val qs = steady.map { case (k, v) => s"\"" + k + "\":" + fmt(v, 1) }
      .mkString("{", ",", "}")
    // exclude failure sentinels from the headline total (a broken query
    // must not SUBTRACT from it either)
    def total(m: Map[String, Double]): String =
      fmt(m.values.filter(_ >= 0).sum, 3)
    println(s"""{"metric":"total","value":${total(steady)},"unit":"sec","queries":$qs,"cold":${total(cold)},"sf":"${sfDir.split('/').last}"}""")
    SparkEntry.closeRunner(spark)
    spark.stop()
  }
}
