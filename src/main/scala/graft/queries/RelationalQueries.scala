package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** SURVEY §2.2–§2.7 operator rows over the TPC-H-ish testdata:
  * projections/filters/predicates, all join shapes, windows, sort,
  * set ops. Each has a DuckDB oracle in [[OperatorOracles]].
  *
  * Scale design notes are inline: the rule is "fact tables shuffle at
  * most once on their join/group key; dimensions broadcast".
  */
object RelationalQueries {

  // ----- §2.2 projections / filters ------------------------------------

  /** P1/P2: projection + aliasing + per-row arithmetic. Narrow scan —
    * Catalyst prunes to 5 of 11 lineitem columns (ReadSchema). */
  def qProjAlias(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem.select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").as("line_no"),
      col("l_quantity").as("qty"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))

  /** P3: star-minus-columns (BigQuery `* EXCEPT(...)` ≡ drop). */
  def qStarExcept(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part.drop("p_retailprice")

  /** P5: IN-list predicate — pushed into the parquet scan. */
  def qFilterIn(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .filter(col("p_size").isin(1, 5, 10, 15) && col("p_type").isin("ECONOMY", "SMALL"))
      .select("p_partkey", "p_brand", "p_type", "p_size")

  /** P6/P7: equality/inequality + NULL predicates. */
  def qFilterCmpNull(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(col("o_orderstatus") =!= "F" && col("o_totalprice") > 150000 &&
        col("o_custkey").isNotNull)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")

  /** P9/F7: LIKE predicates on raw and computed expressions. */
  def qLike(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer
      .filter(col("c_name").like("%00001%") ||
        (col("c_mktsegment").like("B%") && lower(col("c_name")).like("%customer%7")))
      .select("c_custkey", "c_name", "c_mktsegment")

  // ----- §2.3 joins -----------------------------------------------------

  /** J1: inner equi-join fact⋈dim. Customer is small relative to orders
    * at every SF — broadcast it; orders then never shuffles. */
  def qJoinInner(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
  }

  /** J1×2 + A1: 3-way join then aggregate. lineitem⋈orders shuffles on
    * orderkey (both large); customer broadcasts onto the result. At
    * 100 TB this is one fact-fact shuffle + map-side dim join — the
    * minimal movement for this shape. */
  def qJoinMulti(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))
  }

  /** J3: equi-join with residual conjunct inside the ON. */
  def qJoinResidual(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.join(broadcast(t.part),
        col("l_partkey") === col("p_partkey") && col("p_size").isin(1, 5, 10))
      .select("l_orderkey", "l_partkey", "p_size")
  }

  /** J4/J6: left-outer chain across snowflake dims (both broadcast). */
  def qJoinLeftChain(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"), "left")
      .select("c_custkey", "n_name", "r_name")
  }

  /** J7: expression-keyed equi-join (reference joins on
    * lower(trim(email)) — stacked_users_partners.sql:57). Hash joins
    * handle computed keys natively; the derived dim stays broadcast. */
  def qJoinExpr(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir).customer
    val segDim = c.select(upper(col("c_mktsegment")).as("seg_uc")).distinct()
    c.join(broadcast(segDim),
        lower(trim(col("c_mktsegment"))) === lower(trim(col("seg_uc"))))
      .select("c_custkey", "seg_uc")
  }

  /** J9: existence-flag left join (reference's widget-API-key check,
    * user_base.sql:9,57) — left join then IS NOT NULL flag. */
  def qJoinExistsFlag(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val debt = t.customer.filter(col("c_acctbal") < 500)
      .select(col("c_custkey").as("debt_key"))
    t.orders.join(broadcast(debt), col("o_custkey") === col("debt_key"), "left")
      .select(col("o_orderkey"), col("debt_key").isNotNull.as("cust_low_bal"))
  }

  /** Left-semi join (EXISTS): orders having any high-quantity line. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(t.lineitem.filter(col("l_quantity") > 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
  }

  /** Left-anti join (NOT EXISTS): customers with no large order. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.join(t.orders.filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  // ----- §2.5 windows ---------------------------------------------------

  /** W1: top-1 per group via row_number, deterministic tie-break on the
    * unique key (SURVEY §2.5 determinism caveat). Spark ≥3.5 rewrites
    * the rn=1 filter into a per-partition group limit
    * (InferWindowGroupLimit) — no full sort of each partition. */
  def qWindowTop1(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
  }

  /** W4-flavor: aggregate then top-1 per group (the reference's
    * highest-score-per-location dedup). Two-level aggregation instead
    * of agg+window: the second groupBy's max(struct(qty, -suppkey))
    * IS "row_number() over (order by qty desc, suppkey) = 1" (struct
    * comparison is lexicographic), but partial aggregation crosses the
    * second shuffle with ONE row per partkey — no sort, no window, and
    * the second exchange moves |partkey| rows instead of the full
    * (partkey, suppkey) aggregate. */
  def qWindowAggRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val agg = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("qty"))
    agg.groupBy(col("l_partkey"))
      .agg(max(struct(col("qty"), (-col("l_suppkey")).as("neg_sk"))).as("top"))
      .select(col("l_partkey"), (-col("top.neg_sk")).as("l_suppkey"),
        col("top.qty").as("qty"))
  }

  // ----- §2.6 sort / limit ----------------------------------------------

  /** O1: global multi-key sort + limit. Spark plans TakeOrderedAndProject
    * — per-partition top-K then driver merge, no full range shuffle. */
  def qSortGlobalLimit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice")
      .limit(100)

  // ----- §2.7 set ops ---------------------------------------------------

  /** U1/U2: positional UNION ALL with typed NULL literal columns (the
    * reference's 4-route attribution union). */
  def qUnionAllTypedNulls(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val a = t.customer.select(
      col("c_custkey").as("entity_id"),
      col("c_name").as("entity_name"),
      lit(null).cast(DoubleType).as("total"),
      lit("customer").as("src"))
    val b = t.orders.select(
      col("o_custkey").as("entity_id"),
      lit(null).cast(StringType).as("entity_name"),
      col("o_totalprice").as("total"),
      lit("order").as("src"))
    a.unionAll(b)
  }
}
