package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainExt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (n <- (if (args.nonEmpty) args.toSeq else Seq("q_dedup_lsh_verified","q_dedup_ngram_jaccard","q_asof_join","q_sim_cosine_topk"))) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
