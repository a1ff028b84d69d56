package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for named SparkEntry queries to
  * `plans/<tag>/<query>_<suffix>.txt` (build tool — the optimization
  * rounds' before/after plan evidence). Usage:
  *   runMain graft.tools.PlanDump <tag> <suffix> <query> [query ...]
  * e.g. runMain graft.tools.PlanDump r18 before q_ktruss_dist */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query>+")
    val tag = args(0); val suffix = args(1); val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sql.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(outDir)
    for (n <- names) {
      val txt = try {
        graft.SparkEntry.queries(n)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
      } catch { case t: Throwable =>
        s"EXPLAIN FAILED: ${t.getClass.getName}: ${t.getMessage}"
      }
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$tag/${n}_$suffix.txt (${txt.length} chars)")
      graft.ext.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
