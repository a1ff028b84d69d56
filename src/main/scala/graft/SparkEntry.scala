package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{OperatorQueries => OQ, OperatorOracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    OQ.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (OQ.q1Agg _),
    "q_agg_having_countdistinct" -> (OQ.qAggHavingCountDistinct _),
    "q_dedup_groupby" -> (OQ.qDedupGroupBy _),
    "q_scalar_score" -> (OQ.qScalarScore _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OperatorOracles.all
}
