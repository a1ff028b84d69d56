package graft.tools
import org.apache.spark.sql.SparkSession
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(5).selectExpr("id", "id*2 as b").createOrReplaceTempView("t")
    for (q <- Seq(
      "SELECT * EXCEPT (b) FROM t",
      "SELECT id, row_number() OVER (ORDER BY id) rn FROM t QUALIFY rn <= 2",
      "SELECT id FROM t GROUP BY 1",
      "SELECT try_to_date('xx', 'yyyy-MM-dd')",
      "SELECT id FROM t ORDER BY 1"
    )) {
      try { spark.sql(q).collect(); println(s"OK   $q") }
      catch { case e: Throwable => println(s"FAIL $q :: ${e.getMessage.take(120).replace('\n',' ')}") }
    }
    spark.stop()
  }
}
