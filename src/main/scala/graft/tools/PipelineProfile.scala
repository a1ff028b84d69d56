package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Stage-by-stage wall-clock of the curation pipeline (build tool). */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.read.parquet(s"$dir/region.parquet").count()
    val st = time("stats+gate (cache)") {
      val d = TextAnalysis.withLangId(
          TextAnalysis.withStats(Tables(spark, dir).documents))
        .filter(col("n_tokens").between(15, 95) && col("quality_score") >= 0.4)
        .cache()
      d.count(); d
    }
    val deduped = time("exact dedup (cache)") {
      val keepers = st.groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("keep_id"))
      val d = st.join(keepers,
        st("fingerprint") === keepers("fingerprint") &&
          st("doc_id") === keepers("keep_id")).cache()
      d.count(); d
    }
    val sh = time("shingles") {
      val s = Dedup.wordTrigrams(deduped.select("doc_id", "text")).localCheckpoint()
      s.count(); s
    }
    val sigs = time("minhash sigs") {
      val s = Dedup.minhashFromShingles(sh, 8, "doc_id").localCheckpoint()
      s.count(); s
    }
    val cand = time("lsh banding") {
      val c = Dedup.lshCandidates(sigs, 8, 2).localCheckpoint(); c.count(); c
    }
    val cc = time("connected components") {
      val c = Dedup.connectedComponents(cand); c.count(); c
    }
    time("final join") {
      deduped.join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .filter(col("component").isNull || col("component") === col("doc_id"))
        .count()
    }
    spark.stop()
  }
}
