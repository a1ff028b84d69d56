package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for BOTH k-truss paths (build tool). r19: the
  * probe no longer mirrors the operator (the r18 mirror reproduced
  * the PRE-tombstone loop and its attribution went stale — VERDICT
  * r18 #5); it drives the REAL `Graph.kTruss` through its
  * `phaseTimer` hook, so every number is measured on the shipping
  * code. Runs the driver fast path (the q_ktruss shape) and the
  * forced-distributed loop (the q_ktruss_dist shape) back-to-back
  * on the bench co-purchase graph. */
object KtrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val printer: (String, Double) => Unit =
      (label, sec) => println(f"[probe] $label%-28s $sec%7.2fs")
    def pairs() = graft.queries.AdvancedAnalytics.coPurchasePairs(
      graft.sources.Tables(spark, dir).lineitem)
    val reps = sys.env.getOrElse("QBENCH_REPS", "2").toInt
    for (r <- 1 to reps) {
      println(s"=== rep $r: driver fast path (q_ktruss shape) ===")
      val t0 = System.nanoTime()
      val n0 = graft.operators.Graph.kTruss(pairs(), k = 4,
        phaseTimer = printer).count()
      println(f"[probe] TOTAL fast (rows=$n0)      ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      graft.ext.Checkpoints.releaseAll(spark)
      println(s"=== rep $r: distributed loop (q_ktruss_dist shape) ===")
      val t1 = System.nanoTime()
      val n1 = graft.operators.Graph.kTruss(pairs(), k = 4,
        collectThreshold = 0L, phaseTimer = printer).count()
      println(f"[probe] TOTAL dist (rows=$n1)      ${(System.nanoTime() - t1) / 1e9}%7.2fs")
      graft.ext.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
