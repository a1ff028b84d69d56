package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Analytics-operator breadth beyond the reference's own surface:
  * multi-dimensional aggregation (ROLLUP/CUBE/GROUPING SETS), set
  * intersection/difference, pivot, exact percentiles, ordered array /
  * string aggregation, scalar subqueries, lateral explode. All with
  * DuckDB oracles.
  */
object AnalyticsQueries {

  /** ROLLUP over (returnflag, linestatus): hierarchy subtotals + grand
    * total. Spark plans this as a single Expand + hash agg — one
    * shuffle regardless of grouping-set count. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))

  /** CUBE over (orderstatus, orderpriority): all 4 grouping sets. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  /** Explicit GROUPING SETS ((status), (priority)) via SQL — disjoint
    * dimensions, no cross-product rows. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders.createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
  }

  /** INTERSECT (distinct) of customer vs supplier nation keys. */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .intersect(t.supplier.select(col("s_nationkey").as("nationkey")))
  }

  /** EXCEPT (distinct): nations with customers but no suppliers. */
  def qExcept(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .except(t.supplier.select(col("s_nationkey").as("nationkey")))
  }

  /** PIVOT: order counts per priority, statuses as columns. Missing
    * combinations are NULL (pivot left-join semantics; the oracle uses
    * NULLIF(count,0) to mirror that). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))

  /** Exact linear-interpolation percentiles (median + p90) per group —
    * Spark `percentile` ≡ DuckDB `quantile_cont`. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.9)), 4).as("p90"))

  /** Ordered collection aggregates: first-5 sorted ids and an ordered
    * string_agg per group. */
  def qArrayAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).supplier
      .groupBy(col("s_nationkey"))
      .agg(
        concat_ws(",", slice(sort_array(collect_list(col("s_suppkey"))), 1, 5)
          .cast("array<string>")).as("first_ids"),
        concat_ws(",", sort_array(collect_list(col("s_name")))).as("names_csv"))

  /** Scalar subquery: orders within 10% of the global max price. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val mx = o.agg(max(col("o_totalprice")).as("mx"))
    o.crossJoin(broadcast(mx))
      .filter(col("o_totalprice") > col("mx") * 0.9)
      .select("o_orderkey", "o_totalprice")
  }

  /** Lateral posexplode of document tokens (0-based positions). */
  def qPosexplode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(graft.ext.TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))

  /** As-of join (graft.operators.TemporalJoins): each event picks the
    * most recent rate-change at or before its timestamp. The rate
    * table derives deterministically from the event stream (every 5th
    * epoch-hour present in the data). Oracle: DuckDB's native ASOF
    * LEFT JOIN. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val rates = e
      .select(expr("unix_micros(ts) div 3600000000").as("h")).distinct()
      .filter(col("h") % 5 === 0)
      .select(timestamp_micros(col("h") * 3600000000L).as("rate_ts"),
        (col("h") % 97).cast(IntegerType).as("rate"))
    graft.operators.TemporalJoins.asofJoin(
        e.select("event_id", "ts"), rates, "ts", "rate_ts",
        toleranceSeconds = 45L * 24 * 3600, rightTieBreak = "rate_ts")
      .select("event_id", "ts", "rate_ts", "rate")
  }

  /** The NATIVE as-of operator (graft.plans.AsofJoin — custom
    * LogicalPlan/Strategy/SparkPlan, single merge pass per partition):
    * each purchase matched to the user's latest prior view. */
  def qAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts")).distinct()
    graft.plans.AsofJoin.asofJoin(purchases, views,
        Seq("user_id"), Seq("v_user"), "ts", "v_ts")
      .select("event_id", "ts", "v_ts")
  }

  /** Feature-store point-in-time join: assemble a leakage-free
    * training matrix for purchase events by attaching, per feature
    * stream (clicks, views), the user's most recent feature value AT
    * OR BEFORE the label timestamp — two chained native as-of joins
    * ([[graft.plans.AsofJoin]]), each a single per-key merge pass, no
    * windows, no future rows ever visible. Feature streams are
    * pre-deduplicated to one row per (user, ts) (max value) so the
    * as-of pick is well-defined on both engines. */
  def qPitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val labels = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("label_value"))
    def feat(tpe: String, pfx: String) = e.filter(col("event_type") === tpe)
      .groupBy(col("user_id").as(s"${pfx}_user"), col("ts").as(s"${pfx}_ts"))
      .agg(max(col("value")).as(s"${pfx}_value"))
    val withClick = graft.plans.AsofJoin.asofJoin(labels, feat("click", "ck"),
      Seq("user_id"), Seq("ck_user"), "ts", "ck_ts")
    val withView = graft.plans.AsofJoin.asofJoin(withClick, feat("view", "vw"),
      Seq("user_id"), Seq("vw_user"), "ts", "vw_ts")
    withView.select("event_id", "user_id", "ts", "label_value",
      "ck_ts", "ck_value", "vw_ts", "vw_value")
  }

  /** Range (interval-containment) join: events assigned to 6-hour
    * blocks by `start <= ts < end`, then aggregated per block. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val blocks = spark.range(0, 124).select(
      col("id").as("block_id"),
      expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, cast(6 * id as int), 0, 0)").as("block_start"),
      expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, cast(6 * id + 6 as int), 0, 0)").as("block_end"))
    graft.operators.TemporalJoins.rangeJoin(e, broadcast(blocks),
        "ts", "block_start", "block_end")
      .groupBy(col("block_id"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
  }

  /** The same interval assignment through the grid-bucketed equi-join
    * path (TemporalJoins.rangeJoinBucketed, 1-hour cells) — the plan
    * that survives an interval side too large to broadcast. Identical
    * results to q_range_join, verified against the same oracle. */
  def qRangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val blocks = spark.range(0, 124).select(
      col("id").as("block_id"),
      expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, cast(6 * id as int), 0, 0)").as("block_start"),
      expr("timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, cast(6 * id + 6 as int), 0, 0)").as("block_end"))
    graft.operators.TemporalJoins.rangeJoinBucketed(e, blocks,
        "ts", "block_start", "block_end", bucketUs = 3600L * 1000000)
      .groupBy(col("block_id"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
  }

  /** Window-function breadth: lag/lead/first_value/ntile over a unique
    * ordering; rank/dense_rank/percent_rank/cume_dist over a tie-prone
    * ordering (deterministic under ties — equal rows get equal ranks). */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, dir).orders
    val unique = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val tied = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    o.select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(unique).as("rn"),
      rank().over(tied).as("rk"),
      dense_rank().over(tied).as("drk"),
      lag(col("o_totalprice"), 1).over(unique).as("prev_price"),
      lead(col("o_totalprice"), 1).over(unique).as("next_price"),
      first_value(col("o_orderkey")).over(unique).as("first_ok"),
      ntile(4).over(unique).as("quartile"),
      round(percent_rank().over(tied), 6).as("pct_rank"),
      round(cume_dist().over(tied), 6).as("cume"))
  }

  /** Equi-width histogram via floor-division bucketing. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))

  /** Levenshtein distance between consecutive sampled documents —
    * the classic fuzzy-dedup metric (exact DP, deterministic in both
    * engines). Prefixes bound the O(n²) cost. */
  def qTextLevenshtein(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    val a = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("a_id"), substring(lower(col("text")), 1, 40).as("ta"))
    val b = d.select((col("doc_id") - 1).as("a_id"), col("doc_id").as("b_id"),
      substring(lower(col("text")), 1, 40).as("tb"))
    a.join(b, "a_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("ta"), col("tb")).as("lev"),
        greatest(length(col("ta")), length(col("tb")), lit(1)).as("maxlen"))
      .withColumn("sim_ratio",
        round(lit(1.0) - col("lev").cast("double") / col("maxlen"), 6))
      .drop("maxlen")
  }

  /** Correlated EXISTS + uncorrelated IN subqueries through the SQL
    * path (Catalyst decorrelates both into joins). */
  def qExistsInSubquery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.createOrReplaceTempView("sq_orders")
    t.lineitem.createOrReplaceTempView("sq_lineitem")
    t.customer.createOrReplaceTempView("sq_customer")
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM sq_orders
        |WHERE EXISTS (SELECT 1 FROM sq_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |  AND o_custkey IN (SELECT c_custkey FROM sq_customer
        |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin)
  }

  /** Calendar gap-filling: densify per-user daily event counts over
    * the full January grid (users × days left-joined to actuals,
    * missing days = 0) — the standard time-series densification before
    * windowed metrics. */
  def qGapfill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val days = spark.range(0, 30).select(
      date_add(to_date(lit("2024-01-01")), col("id").cast("int")).as("day"))
    val users = e.select(col("user_id")).distinct()
    val daily = e.groupBy(col("user_id").as("u"),
        col("ts").cast(DateType).as("d"))
      .agg(count(lit(1)).as("n_actual"))
    users.crossJoin(broadcast(days))
      .join(daily, col("user_id") === col("u") && col("day") === col("d"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_actual"), lit(0L)).as("n"))
  }

  /** Cohort retention: users cohorted by first-seen day; distinct
    * active users per (cohort_day, day_offset). */
  def qCohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("ts").cast(DateType).as("day"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** LATERAL correlated subquery: per customer, their top-2 orders by
    * price — the decorrelated-subquery shape (Catalyst rewrites the
    * lateral into a ranked join). */
  def qLateral(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.createOrReplaceTempView("lat_cust")
    t.orders.createOrReplaceTempView("lat_orders")
    spark.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM lat_cust,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM lat_orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)
  }

  /** ROLLUP with GROUPING() flags — distinguishes "NULL because
    * subtotal" from "NULL because data" in multi-level aggregates. */
  def qGroupingFlags(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"))

  /** Bitwise aggregates over int key bits per group. */
  def qBitAggs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .groupBy(col("p_type"))
      .agg(
        bit_and(col("p_size")).as("band"),
        bit_or(col("p_size")).as("bor"),
        bit_xor(col("p_size")).as("bxor"))

  /** Misc scalar grab-bag: translate/initcap/repeat/reverse/ascii,
    * array construction + set ops with sorted output. */
  def qMiscFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).nation.select(
      col("n_nationkey"),
      translate(col("n_name"), "AEIOU", "aeiou").as("translated"),
      concat(upper(substring(col("n_name"), 1, 1)),
        lower(expr("substring(n_name, 2)"))).as("title"),
      reverse(col("n_name")).as("rev"),
      repeat(lit("ab"), 3).as("rep"),
      ascii(col("n_name")).as("first_code"),
      concat_ws(",", array_sort(array_union(
        array(col("n_nationkey"), col("n_regionkey")),
        array(col("n_regionkey"), col("n_regionkey") * 2)))
        .cast("array<string>")).as("keys_union"))

  /** UNION (distinct) — the set-union complement of q_intersect. */
  def qUnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .union(t.supplier.select(col("s_nationkey").as("nationkey"))).distinct()
  }

  /** Exact mean/variance/stddev per group via decomposable integer
    * moments: cents and squared cents summed in DECIMAL(38,0)
    * (DuckDB: HUGEINT) — overflow-safe and order-independent, then one
    * integer→double conversion at the end. The pattern for exact
    * second moments over 100 TB where naive double summation diverges
    * run-to-run. */
  def qStatsMoments(spark: SparkSession, dir: String): DataFrame = {
    val c = round(col("o_totalprice") * 100, 0).cast(DecimalType(38, 0))
    Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(c).as("s1"), sum(c * c).as("s2"))
      .select(col("o_orderpriority"), col("n"),
        round((col("s1").cast(DoubleType) / col("n")) / 100.0, 4).as("mean"),
        round((((col("n") * col("s2") - col("s1") * col("s1")).cast(DoubleType)
          / (col("n").cast(DoubleType) * col("n")))
          / 10000.0), 4).as("var_pop"))
      .withColumn("std_pop", round(sqrt(col("var_pop")), 4))
  }

  /** JSON-ish field extraction from the events props column via regex
    * (portable to the oracle without a JSON extension). */
  def qEventsProps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast(IntegerType).as("k"))

  /** RFM customer segmentation (recency / frequency / monetary
    * quintiles) WITHOUT the textbook global-ntile — `ntile(5) OVER
    * (ORDER BY …)` is an unpartitioned window that sorts every
    * customer in ONE task. Instead: exact interpolated quintile
    * cutoffs (one tiny agg row, broadcast back over the corpus — the
    * weighted-sample stats discipline) and per-row comparisons, so
    * the plan is two aggregates and a broadcast join at any scale.
    * Ties land deterministically (same value ⟹ same bucket — arguably
    * SOUNDER than ntile's arbitrary equal-size splits, and exactly
    * replayable by quantile_cont in the oracle). Recency buckets are
    * inverted: the most recent fifth scores 5. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100, 0).cast(LongType)
    val perCust = Tables(spark, dir).orders
      .groupBy(col("o_custkey"))
      .agg(datediff(lit("1998-12-31").cast(DateType), max(col("o_orderdate")))
          .as("r_days"),
        count(lit(1)).as("freq"),
        sum(cents).as("m_cents"))
    val cutCols = Seq("r_days", "freq", "m_cents").flatMap { m =>
      Seq(2, 4, 6, 8).map(q =>
        percentile(col(m), lit(q / 10.0)).as(s"${m}_c$q"))
    }
    val cuts = perCust.agg(cutCols.head, cutCols.tail: _*)
    def bucket(x: Column, m: String): Column =
      lit(1) + Seq(2, 4, 6, 8).map(q =>
        when(x > col(s"${m}_c$q"), 1).otherwise(0): Column).reduce(_ + _)
    perCust.crossJoin(broadcast(cuts))
      .select(col("o_custkey"), col("r_days"), col("freq"), col("m_cents"),
        (lit(6) - bucket(col("r_days"), "r_days")).as("r"),
        bucket(col("freq"), "freq").as("f"),
        bucket(col("m_cents"), "m_cents").as("m"))
      .withColumn("rfm_score", col("r") * 100 + col("f") * 10 + col("m"))
  }
}
