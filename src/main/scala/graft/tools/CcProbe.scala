package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.sources.Tables

/** Dev probe: stage-level timing of the clusters pipeline. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, sfDir).documents
    val sh = t("wordTrigrams ckpt")(Dedup.wordTrigrams(docs).localCheckpoint())
    val sigs = t("minhash sigs ckpt")(
      Dedup.minhashFromShingles(sh, 8, "doc_id").localCheckpoint())
    val cand = t("lshCandidates ckpt")(
      Dedup.lshCandidates(sigs, 8, 2).localCheckpoint())
    println("cand rows " + cand.count())
    val cc = t("connectedComponents")(Dedup.connectedComponents(cand))
    println("cc rows " + t("cc count")(cc.count()))
    // second run to observe warm costs
    val sigs2 = t("sigs from scratch (warm)")(
      Dedup.minhashSignatures(docs, 8).localCheckpoint())
    val cand2 = t("cands from sigs (warm)")(
      Dedup.lshCandidates(sigs2, 8, 2).localCheckpoint())
    val cc2 = t("CC warm")(Dedup.connectedComponents(cand2))
    t("cc2 count")(cc2.count())
    spark.stop()
  }
}
