package graft.queries

/** DuckDB oracle SQL, one entry per query in the SparkEntry.queries map.
  * Runs against the same parquet tables (driver registers them by name).
  * Arithmetic mirrors the Spark side exactly (same scaling, same
  * operation order) so doubles are bit-identical.
  */
object OperatorOracles {

  val all: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
        |  SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0 AS sum_disc_price_x100,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_having_countdistinct" ->
      """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem
        |GROUP BY l_orderkey
        |HAVING COUNT(DISTINCT l_suppkey) > 3""".stripMargin,

    "q_dedup_groupby" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem""".stripMargin,

    "q_scalar_score" ->
      """SELECT c_custkey,
        |  (CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN c_mktsegment IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END
        |   + CASE WHEN c_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS score
        |FROM customer""".stripMargin
  )
}
