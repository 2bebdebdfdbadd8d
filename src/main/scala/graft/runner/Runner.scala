package graft.runner

import org.apache.spark.sql.SparkSession

/** Runner factory with per-process caching keyed by (session, store, flags) —
  * the reference's `Runner()` singleton pattern (`runners/__init__.py:55-106`,
  * `config.py:18-71`): repeated `Runner()` calls with the same configuration
  * return the same instance (sharing its in-process memo), and configuration
  * defaults come from the environment.
  *
  * Config resolution order: explicit argument → `GRAFT_STORE` env var →
  * `./graft-store`.
  */
object Runner {

  private val cache =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, Boolean, Boolean), LocalSparkRunner]

  def defaultStoreUri: String =
    sys.env.getOrElse("GRAFT_STORE", "graft-store")

  def apply(spark: SparkSession,
            storeUri: String = null,
            validateLengths: Boolean = true,
            cacheColumns: Boolean = true): LocalSparkRunner = synchronized {
    val store = Option(storeUri).getOrElse(defaultStoreUri)
    cache.getOrElseUpdate((spark, store, validateLengths, cacheColumns),
      new LocalSparkRunner(spark, store, validateLengths, cacheColumns))
  }

  /** Drop cached runners (tests / reconfiguration). */
  def reset(): Unit = synchronized { cache.clear() }
}
