package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}
import graft.sources.Tables
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("[probe] token stats: " + docs.select(size(TextAnalysis.tokens(col("text"))).as("n"))
      .agg(count(lit(1)), avg("n"), max("n")).head())
    t("tokens+md5 only")(docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(Dedup.portableHash60(col("tok"))).agg(sum(lit(1))).head())
    val ch = Dedup.cdcChunks(docs)
    t("cdcChunks count")(println("chunks " + ch.count()))
    spark.stop()
  }
}
