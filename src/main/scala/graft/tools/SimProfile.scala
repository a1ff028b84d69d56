package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.{Dedup, Similarity}
import graft.sources.Tables

/** Stage-by-stage wall-clock of q_sim_clusters (build tool). */
object SimProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val emb = Tables(spark, dir).embeddings
    time("embeddings count")(emb.count())
    for (rep <- 1 to 2) {
      val pairs = time(s"[$rep] nearDupPairs") {
        val p = Similarity.cosineNearDupPairs(emb,
          threshold = 0.35, numPlanes = 16, rowsPerBand = 4)
        println(s"  pairs=${p.count()}"); p
      }
      time(s"[$rep] connectedComponents") {
        println(s"  comps=${Dedup.connectedComponents(pairs).count()}")
      }
      time(s"[$rep] CC @4 shuffle parts") {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try println(s"  comps=${Dedup.connectedComponents(pairs).count()}")
        finally spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      time(s"[$rep] CC @1 shuffle part") {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        try println(s"  comps=${Dedup.connectedComponents(pairs).count()}")
        finally spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      time(s"[$rep] full q_sim_clusters") {
        graft.ext.ExtQueries.qSimClusters(spark, dir).count()
      }
    }
    spark.stop()
  }
}
