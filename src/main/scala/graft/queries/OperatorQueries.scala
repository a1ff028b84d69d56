package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Operator-level parity queries over the shared TPC-H-ish testdata.
  *
  * One query per SURVEY.md §2 operator row. Each has a DuckDB oracle in
  * [[OperatorOracles]]; results must hash-match after canonicalization
  * (sorted rows / columns). Numeric discipline for oracle parity:
  * aggregate doubles via exact integer arithmetic (scale to cents,
  * ROUND, cast BIGINT, sum exactly, divide back) so Spark and DuckDB
  * agree bit-for-bit irrespective of double-summation order.
  *
  * Scale notes: every query is a declarative DataFrame plan — Catalyst
  * pushes filters/projections into the parquet scan, AQE picks
  * broadcast-vs-shuffle joins at runtime. Small dimensions (region,
  * nation, supplier) get explicit broadcast hints: at 100 TB the fact
  * tables shuffle-partition on join keys while dims replicate.
  */
object OperatorQueries {

  /** Exact sum of a 2-decimal double column: scale to cents, round to
    * kill float dust, sum as BIGINT (exact), return cents. */
  private def sumCents(c: Column): Column =
    sum(round(c * 100, 0).cast(LongType))

  /** cents -> double amount; bit-identical to DuckDB's `x / 100.0`. */
  private def centsToAmount(c: Column): Column = c / 100.0

  // ---------------------------------------------------------------------
  // Aggregations (SURVEY §2.4)
  // ---------------------------------------------------------------------

  /** A1-flavor flagship agg (TPC-H Q1 shape): group lineitem by flags,
    * exact sums + avg + count. Map-side partial agg then single shuffle
    * on the (tiny) group key — optimal at any scale. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(LongType)).as("sum_qty"),
        centsToAmount(sumCents(col("l_extendedprice"))).as("sum_base_price"),
        centsToAmount(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
          .cast(LongType))).as("sum_disc_price_x100"),
        (sum(col("l_quantity").cast(LongType)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** A1 proper: GROUP BY + HAVING COUNT(DISTINCT) — suppliers shipping
    * >3 distinct parts per order-priority bucket... expressed on
    * lineitem: orders with more than 3 distinct suppliers. Spark plans
    * distinct-agg as expand + two-phase hash agg automatically. */
  def qAggHavingCountDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .filter(col("n_supp") > 3)
  }

  /** A2: GROUP BY over all selected columns with no agg = DISTINCT. */
  def qDedupGroupBy(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    li.select("l_returnflag", "l_linestatus", "l_shipdate").distinct()
  }

  /** A3: scalar "score" — sum of CASE WHEN ... IS NOT NULL terms (the
    * reference's completeness score, locations_clean.sql:139-146). */
  def qScalarScore(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val score =
      when(col("c_name").isNotNull, 1).otherwise(0) +
      when(col("c_mktsegment").isNotNull, 1).otherwise(0) +
      when(col("c_acctbal") > 0, 1).otherwise(0) +
      when(col("c_nationkey").isNotNull, 1).otherwise(0)
    c.select(col("c_custkey"), score.as("score"))
  }
}
