package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext._
import graft.sources.Tables
object ProfileCuration {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val st = TextAnalysis.withLangId(TextAnalysis.withStats(Tables(spark, dir).documents))
      .filter(col("n_tokens").between(15, 95) && col("quality_score") >= 0.4).cache()
    t("st count")(println(st.count()))
    val keepers = st.groupBy(col("fingerprint")).agg(min(col("doc_id")).as("keep_id"))
    val deduped = st.join(keepers, st("fingerprint") === keepers("fingerprint") && st("doc_id") === keepers("keep_id")).cache()
    t("deduped count")(println(deduped.count()))
    val sh = t("shingles"){ val x = Dedup.wordTrigrams(deduped.select("doc_id","text")).cache(); println(x.count()); x }
    val sigs = t("sigs"){ val x = Dedup.minhashFromShingles(sh, 8, "doc_id").cache(); println(x.count()); x }
    val cand = t("cand"){ val x = Dedup.lshCandidates(sigs, 8, 2).cache(); println(x.count()); x }
    val cc = t("cc")(Dedup.connectedComponents(cand))
    t("cc count")(println(cc.count()))
    spark.stop()
  }
}
