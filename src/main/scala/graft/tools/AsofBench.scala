package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AsofBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.1").events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).cache()
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts")).distinct().cache()
    purchases.count(); views.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[asof-bench] $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    // warm both paths once, then measure
    for (round <- 1 to 2) {
      time(s"native r$round") {
        graft.plans.AsofJoin.asofJoin(purchases, views,
          Seq("user_id"), Seq("v_user"), "ts", "v_ts").count()
      }
      time(s"composed r$round") {
        import org.apache.spark.sql.expressions.Window
        val cond = col("user_id") === col("v_user") && col("v_ts") <= col("ts")
        val w = Window.partitionBy(col("event_id")).orderBy(col("v_ts").desc)
        purchases.join(views, cond, "left")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
      }
    }
    spark.stop()
  }
}
