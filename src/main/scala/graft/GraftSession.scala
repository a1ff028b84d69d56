package graft

import org.apache.spark.sql.SparkSession
import graft.sql.GraftExtensions

/** Opinionated session factory: the configuration this engine is
  * designed against, in one place.
  *
  *  - AQE on (runtime join-strategy + skew-join + partition coalesce)
  *  - shuffle partitions sized to cores for local mode (not the 200
  *    default — SURVEY §4); on a real cluster, set to 2–3× total cores
  *  - UTC + ANSI-off for BigQuery SAFE-parse parity (BASELINE.md)
  *  - GraftExtensions injected so st_distance/regexp_contains/
  *    dot_product etc. work in SQL from the first query
  */
object GraftSession {

  /** NOTE: call before any other SparkSession exists in the JVM —
    * getOrCreate returns a pre-existing session unchanged, and
    * extensions/static confs cannot be applied retroactively (use
    * GraftFunctions.register(spark) on a live session instead). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
