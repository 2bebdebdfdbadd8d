package graft

import java.nio.file.{Files, Path, Paths}

import graft.spec._

/** Runner configuration with the reference's source priority
  * (`config.py:18-66`): environment variables (`GRAFT_RUNNER_TYPE`,
  * `GRAFT_STORE_URI`, `GRAFT_CACHE_PATH`) over a JSON config file over
  * defaults. The file lives under `~/.config/graft/graft_config.json`
  * (overridable via `GRAFT_CONFIG_HOME` env or the `graft.config.home`
  * system property — the latter is what tests use). CLI flags always win
  * over all of these ([[Cli]]).
  */
final case class GraphConfig(
    runnerType: String = "LocalSparkRunner",
    storeUri: String =
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-store").toString,
    cachePath: String =
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-cache").toString) {

  def toJson: JObj = JObj(
    "runner_type" -> JString(runnerType),
    "store_uri" -> JString(storeUri),
    "cache_path" -> JString(cachePath))

  /** A cache tier applies only when the configured runner is the tiered
    * one (reference `cache_path` doc: "runner_type=LocalCacheRunner only"). */
  def wantsCache: Boolean = runnerType == "CachedSparkRunner"
}

object GraphConfig {

  def configHome: Path =
    sys.props.get("graft.config.home").orElse(sys.env.get("GRAFT_CONFIG_HOME"))
      .map(Paths.get(_))
      .getOrElse(Paths.get(System.getProperty("user.home"), ".config", "graft"))

  def configFile: Path = configHome.resolve("graft_config.json")

  /** env > file > defaults, per field. */
  def load(): GraphConfig = {
    val fromFile =
      if (Files.exists(configFile))
        Json.parse(Files.readString(configFile)) match {
          case o: JObj =>
            def s(n: String): Option[String] = o.get(n) match {
              case Some(JString(v)) => Some(v); case _ => None
            }
            val d = GraphConfig()
            GraphConfig(
              s("runner_type").getOrElse(d.runnerType),
              s("store_uri").getOrElse(d.storeUri),
              s("cache_path").getOrElse(d.cachePath))
          case _ => GraphConfig()
        }
      else GraphConfig()
    def env(n: String): Option[String] =
      sys.props.get("graft.env." + n).orElse(sys.env.get(n))
    GraphConfig(
      env("GRAFT_RUNNER_TYPE").getOrElse(fromFile.runnerType),
      env("GRAFT_STORE_URI").getOrElse(fromFile.storeUri),
      env("GRAFT_CACHE_PATH").getOrElse(fromFile.cachePath))
  }

  def save(c: GraphConfig): Path = {
    Files.createDirectories(configFile.getParent)
    Files.writeString(configFile, Json.renderPretty(c.toJson) + "\n")
    configFile
  }
}
