package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm per-query micro-benchmark (build tool): runs each named
  * SparkEntry query `QBENCH_REPS` times against `SPARK_GRAFT_SF_DIR`
  * under the same session config Bench uses, printing every rep plus
  * the min. Single-shot numbers vary ±15% — compare mins. */
object QBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("QBENCH_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (n <- args) {
      val fn = graft.SparkEntry.queries(n)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.ext.Checkpoints.releaseAll(spark) // same protocol as Bench
        dt
      }
      println(f"$n%-30s ${times.map(t => f"$t%6.2f").mkString(" ")}  min=${times.min}%6.2f")
    }
    spark.stop()
  }
}
