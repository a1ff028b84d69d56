package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (n <- Seq("q1_agg","q_join_multi","q_window_top1","q_window_agg_rank",
      "q_proj_alias","q_filter_in","q_join_left_chain",
      "q_sim_near_dup","q_asof_join","q_contamination",
      "q_tpch_q17","q_tpch_q18","q_tpch_q21","q_sim_pq_topk","q_sim_ivf_topk")) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
