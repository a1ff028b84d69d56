package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("bloom.enabled=" + spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    println("bloom.creationSideThreshold=" + spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"))
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val part = spark.read.parquet(s"$dir/part.parquet").filter(col("p_brand") === "Brand#23")
    // disable broadcast so the shuffle-join runtime filter path is exercised
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val j = li.join(part, col("l_partkey") === col("p_partkey"))
    val plan = j.queryExecution.executedPlan.toString
    println("has-bloom=" + (plan.toLowerCase.contains("bloom")))
    println(plan.split("\n").filter(_.toLowerCase.contains("bloom")).take(4).mkString("\n"))
    spark.stop()
  }
}
