package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-driven column profiling — the data-quality sweep a warehouse
  * runs before trusting a new source: per-column non-null and distinct
  * counts in ONE pass over the data (all aggregates in a single
  * hash-agg; the per-column rows are exploded from the one aggregated
  * row, not from per-column scans).
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = explode(array(cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"__nn_$c").as("n_nonnull"),
      col(s"__nd_$c").as("n_distinct"))): _*)).as("p")
    row.select(col("__n").as("n_rows"), stacked)
      .select(col("p.column_name"), col("n_rows"),
        col("p.n_nonnull"), col("p.n_distinct"))
  }
}
