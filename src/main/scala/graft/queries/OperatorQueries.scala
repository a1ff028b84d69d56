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

  /** TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    * revenue per order, top 10. Revenue is pre-aggregated by
    * l_orderkey BEFORE the orders join: o_orderdate is functionally
    * dependent on the join key, so group-then-join ≡ join-then-group,
    * and the fact-fact shuffle moves one partial-agg row per order
    * instead of every (price, discount) line. Filters reach all three
    * scans; customer broadcasts; TakeOrderedAndProject avoids a
    * global sort. */
  def qTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
    val rev = t.lineitem.filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
        .cast(LongType)).as("rev_e4"))
    rev
      .join(t.orders.filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("l_orderkey"), col("o_orderdate"),
        (col("rev_e4") / 100.0).as("revenue_x100"))
      .orderBy(col("revenue_x100").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join (region→nation→customer→orders→
    * lineitem→supplier with same-nation residual), revenue per nation.
    * All dims broadcast; the two fact tables shuffle once each on
    * orderkey. */
  def qTpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier),
        col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name").isin("AMERICA", "ASIA"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
        .cast(LongType)) / 100.0).as("revenue_x100"))
  }

  /** TPC-H Q18 shape (large-quantity orders) routed through the
    * explicit skew path: the lineitem⋈big-orders join goes through
    * [[graft.sources.Skew.saltedJoin]] — the fact side's rows spread
    * over random sub-keys and the (small) key list replicates per
    * salt, so a hot orderkey can't pin a single reducer. The re-sum
    * after the salted join is decomposable, so map-side partial agg
    * still fires. Correctness is independent of the salt values — the
    * DuckDB oracle hash proves the salting is semantics-preserving
    * end to end. Customer is broadcast; top-100 is
    * TakeOrderedAndProject. */
  def qTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("tq"))
      .filter(col("tq") > 250).select("l_orderkey")
    val fat = graft.sources.Skew.saltedJoin(
      t.lineitem.select("l_orderkey", "l_quantity"), big, "l_orderkey", salts = 8)
    val qty = fat.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("total_qty"))
    qty.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * scalar subquery ("20% of this part's average quantity") decorrelates
    * into a per-partkey aggregate joined back — the form Catalyst
    * would produce, written directly. The per-part threshold is an
    * integer-exact average (BIGINT quantity sum / count) so both
    * engines compare against bit-identical doubles; the brand/size
    * filter broadcasts into the fact scan. (p_container isn't in the
    * synthetic schema — p_size stands in.) */
  def qTpchQ17(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val li = t.lineitem
    val avgq = li.groupBy(col("l_partkey"))
      .agg((lit(0.2) * (sum(col("l_quantity").cast(LongType)).cast(DoubleType) /
        count(lit(1)))).as("thr"))
    li.join(broadcast(t.part.filter(col("p_brand") === "Brand#12" && col("p_size") < 15)),
        col("l_partkey") === col("p_partkey"))
      .join(avgq, "l_partkey")
      .filter(col("l_quantity") < col("thr"))
      .agg((sumCents(col("l_extendedprice")) / 100.0 / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q21 shape (suppliers who kept 'F' orders waiting): the
    * EXISTS/NOT EXISTS pair collapses into one pass — a late row
    * survives iff its order has >1 distinct supplier (EXISTS another
    * line) and exactly 1 distinct LATE supplier (NOT EXISTS another
    * late line). Instead of a semi join + anti join that scan
    * lineitem three times, lineitem joins orders ONCE and a two-level
    * aggregation ((orderkey, suppkey) then orderkey — partial-agg
    * map-side, no count-distinct Expand) derives both existence
    * facts; since the qualifying order has a single late supplier,
    * max(late suppkey) recovers it and sum(late rows) preserves the
    * original per-row count(*) multiplicity. All three shuffles share
    * the orderkey clustering until the final broadcast to supplier.
    * "Late" is shipped >90 days after the order date (the synthetic
    * schema has no receipt/commit dates). */
  def qTpchQ21(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val li = t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .cast(LongType))
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(col("is_late")).as("late_rows"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum((col("late_rows") > 0).cast(LongType)).as("n_late_supp"),
        sum(col("late_rows")).as("n_late_rows"),
        max(when(col("late_rows") > 0, col("l_suppkey"))).as("late_supp"))
    perOrder.filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .join(broadcast(t.supplier), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(sum(col("n_late_rows")).as("numwait"))
  }

  /** Two-phase salted aggregation under the oracle: lineitem grouped
    * by l_returnflag — 3 values over 600k rows, the textbook skewed
    * group key. [[graft.sources.Skew.saltedCountSum]] partial-aggs on
    * (key, salt) then finalizes on key, so no single reducer owns a
    * whole hot key. The summed column is pre-cast to long, making
    * both aggregation levels exact integers — the random salt
    * assignment cannot perturb the result, which is exactly what the
    * hash-match proves. */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .withColumn("qty", col("l_quantity").cast(LongType))
    graft.sources.Skew.saltedCountSum(li, "l_returnflag", "qty", salts = 8)
      .withColumnRenamed("sum", "sum_qty")
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

  /** End-to-end incremental/CDC lifecycle over a real on-disk target
    * ([[graft.model.Incremental]]): bootstrap-merge a base slice of
    * orders, then APPLY CHANGES with a deterministic mixed batch —
    * updates (seq 2), inserts of held-out keys (seq 1), deletes
    * (seq 3, beating any update), and a stale out-of-order update
    * (seq 1, losing wherever a higher-seq change exists). The oracle
    * folds the identical batch in SQL (latest-by-seq per key,
    * delete-beats-stale), so the driver hash-checks the MATERIALIZED
    * table the merge produced, not just the plan. The target path is
    * recreated per run — reruns are deterministic. */
  def qIncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val path = System.getProperty("java.io.tmpdir") + "/graft_incr_merge"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    graft.model.Incremental.merge(spark,
      o.filter(col("o_orderkey") % 7 =!= 0), path, Seq("o_orderkey"))
    val upd = o.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(2))
    val ins = o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("op", lit("I")).withColumn("seq", lit(1))
    val del = o.filter(col("o_orderkey") % 11 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3))
    val stale = o.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_totalprice", col("o_totalprice") - 500.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(1))
    graft.model.Incremental.applyChanges(spark,
      upd.unionByName(ins).unionByName(del).unionByName(stale),
      path, Seq("o_orderkey"))
  }

  /** Driver-oracle row for the cross-batch-safe CDC fold
    * ([[graft.model.Incremental.applyChangesGuarded]]): two separate
    * folds where the SECOND batch replays a stale lower-seq update —
    * the exact out-of-order-across-batches case the unguarded
    * [[graft.model.Incremental.applyChanges]] leaves to the feed's
    * ordering contract. Fold 1 inserts every key (seq 1) and updates
    * even keys (+100, seq 3); fold 2 carries a LATE +999 update at
    * seq 2 for %4 keys (must lose to the persisted seq 3), a +7
    * update at seq 5 for %5 keys (applies), and deletes %3 keys at
    * seq 9 (tombstoned — beats the same batch's seq-5 update where
    * both hit). The oracle computes the final live view per key in
    * one CASE; a hash match is only possible if the on-disk seq guard
    * actually held the stale replay out. */
  def qCdcGuarded(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice").as("v"))
    val path = System.getProperty("java.io.tmpdir") + "/graft_cdc_guarded"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val ins = o.withColumn("op", lit("I")).withColumn("seq", lit(1))
    val upd = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("v", col("v") + 100.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(3))
    graft.model.Incremental.applyChangesGuarded(spark,
      ins.unionByName(upd), path, Seq("o_orderkey"))
    val lateStale = o.filter(col("o_orderkey") % 4 === 0)
      .withColumn("v", col("v") + 999.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(2))
    val fresh = o.filter(col("o_orderkey") % 5 === 0)
      .withColumn("v", col("v") + 7.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(5))
    val del = o.filter(col("o_orderkey") % 3 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(9))
    graft.model.Incremental.applyChangesGuarded(spark,
      lateStale.unionByName(fresh).unionByName(del), path, Seq("o_orderkey"))
    graft.model.Incremental.readCdcTable(spark, path)
  }

  /** Driver-oracle row for guarded-CDC tombstone compaction
    * ([[graft.model.Incremental.compactGuarded]]): replays
    * [[qCdcGuarded]]'s two folds, adds a THIRD fold deleting %7 keys
    * at seq 12, then compacts at replay horizon 9 — the %3 tombstones
    * (seq 9 ≤ horizon) must vanish while the %7 tombstones (seq 12 >
    * horizon) and every live row's forward-only `__seq` survive. The
    * query returns the RAW on-disk table including the bookkeeping
    * columns, so the hash check proves exactly which rows the
    * compaction kept, not just the live view. */
  def qCdcCompact(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice").as("v"))
    val path = System.getProperty("java.io.tmpdir") + "/graft_cdc_compact"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val ins = o.withColumn("op", lit("I")).withColumn("seq", lit(1))
    val upd = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("v", col("v") + 100.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(3))
    graft.model.Incremental.applyChangesGuarded(spark,
      ins.unionByName(upd), path, Seq("o_orderkey"))
    val lateStale = o.filter(col("o_orderkey") % 4 === 0)
      .withColumn("v", col("v") + 999.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(2))
    val fresh = o.filter(col("o_orderkey") % 5 === 0)
      .withColumn("v", col("v") + 7.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(5))
    val del = o.filter(col("o_orderkey") % 3 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(9))
    graft.model.Incremental.applyChangesGuarded(spark,
      lateStale.unionByName(fresh).unionByName(del), path, Seq("o_orderkey"))
    val del2 = o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(12))
    graft.model.Incremental.applyChangesGuarded(spark,
      del2, path, Seq("o_orderkey"))
    graft.model.Incremental.compactGuarded(spark, path, horizonSeq = 9L)
  }

  /** Driver-oracle row for the incremental AGGREGATE refresh
    * ([[graft.model.Incremental.aggRefresh]]): bootstrap the metrics
    * rollup from the historical 3/4 of events, then fold two disjoint
    * nightly batches into the on-disk algebraic state (scalars + HLL
    * registers). The oracle recomputes the rollup from the FULL event
    * history in one shot — hash-match proves refresh ≡ recompute,
    * including the mergeable sketch state. */
  def qAggRefresh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val path = System.getProperty("java.io.tmpdir") + "/graft_agg_refresh"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    def fold(pred: Column) = graft.model.Incremental.aggRefresh(spark,
      e.filter(pred), path, "event_type",
      round(col("value") * 100, 0), col("user_id"))
    // the two nightly batches split the %4==3 residue by mod 8 (ids
    // ≡3 mod 4 are all odd, so an even/odd split would leave night A
    // EMPTY and the scenario would degenerate to one real fold)
    fold(col("event_id") % 4 =!= 3)                             // bootstrap
    fold(col("event_id") % 8 === 3)                             // night A
    fold(col("event_id") % 8 === 7)                             // night B
  }

  /** Driver-oracle row for the insert_overwrite incremental strategy
    * ([[graft.model.Incremental.insertOverwrite]]): bootstrap a
    * month-partitioned orders table, then re-run two months with a
    * THINNER drifted batch (only the even keys, prices bumped) — the
    * partitions must be REPLACED (rows disappear), not merged, while
    * every other month is untouched. The oracle folds the same
    * replacement set-algebraically. */
  def qInsertOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice"),
        substring(col("o_orderdate").cast("string"), 1, 7).as("month"))
    val path = System.getProperty("java.io.tmpdir") + "/graft_insert_overwrite"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    graft.model.Incremental.insertOverwrite(spark, base, path, "month")
    val batch = base
      .filter(col("month").isin("1995-03", "1995-04") &&
        col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100.0)
    graft.model.Incremental.insertOverwrite(spark, batch, path, "month")
  }

  /** Change-feed generation ([[graft.model.Incremental.changeFeed]]):
    * diff two drifted versions of orders into the minimal I/U/D
    * stream. The oracle derives the same feed set-algebraically
    * (anti-joins for I/D, value-inequality join for U). */
  def qChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val oldV = o.filter(col("o_orderkey") % 3 =!= 0)
    val newV = o.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
    graft.model.Incremental.changeFeed(oldV, newV, Seq("o_orderkey"))
  }

  /** SCD2 time travel ([[graft.model.Incremental.scd2AsOf]]): build
    * the two-round snapshot, then read it AS OF a timestamp between
    * the rounds — exactly the round-1 table, whatever happened at
    * round 2 (closed rows keep their original values, round-2 opens
    * are invisible). */
  def qScd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val path = System.getProperty("java.io.tmpdir") + "/graft_scd2_asof"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    graft.model.Incremental.snapshot(spark,
      o.filter(col("o_orderkey") % 3 =!= 0), path, Seq("o_orderkey"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val snap = graft.model.Incremental.snapshot(spark,
      o.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice"))),
      path, Seq("o_orderkey"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    graft.model.Incremental.scd2AsOf(snap,
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
  }

  /** Driver-oracle row for the dbt-snapshot (SCD2) materialization
    * ([[graft.model.Incremental.snapshot]]): two snapshot runs onto an
    * on-disk table — t1 over two-thirds of orders, t2 over a drifted
    * batch (prices bumped on the %5 keys, the %7 keys gone, the %3
    * keys newly arrived) — exercising all four lifecycle paths at
    * once: unchanged rows stay open from t1, changed and deleted rows
    * close at t2, changed and new keys open at t2. The DuckDB oracle
    * folds the same two batches with value-equality joins (the md5
    * change-hash is an internal detail — equal hash ⟺ equal values),
    * so the whole valid_from/valid_to/is_current history hash-matches.
    */
  def qScd2Snapshot(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val path = System.getProperty("java.io.tmpdir") + "/graft_scd2"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    graft.model.Incremental.snapshot(spark,
      o.filter(col("o_orderkey") % 3 =!= 0), path, Seq("o_orderkey"), t1)
    graft.model.Incremental.snapshot(spark,
      o.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice"))),
      path, Seq("o_orderkey"), t2)
      .drop("__hash")
  }

  /** dbt ephemeral materialization end-to-end (SURVEY §2.11, round
    * 15 — dbt's fourth materialization; the reference checkout uses
    * view/table but its dbt runtime offers ephemeral): a TWO-DEEP
    * ephemeral staging chain inlines as `__dbt__cte__` CTEs into the
    * mart; the staging models never materialize anywhere. The oracle
    * replays the logical composition as one plain SQL query — proving
    * inline-as-CTE ≡ the composed query. Scale note: because the mart
    * is ONE statement, Catalyst pushes the status filter through both
    * ephemeral layers into the orders scan and prunes to the three
    * referenced columns — ephemeral staging costs nothing at 100 TB,
    * which is exactly why dbt projects stage this way. */
  def qEphemeralCte(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val wh = System.getProperty("java.io.tmpdir") + "/graft_ephwh"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh), true)
    val out = new graft.sql.DbtSqlEngine(spark, wh).run(
      modelSql = Map(
        "stg_orders" ->
          ("{{ config(materialized='ephemeral') }}\n" +
            "select o_orderkey, o_custkey, o_totalprice, o_orderstatus " +
            "from {{ source('raw', 'orders') }}"),
        "stg_open_orders" ->
          ("{{ config(materialized='ephemeral') }}\n" +
            "select o_orderkey, o_custkey, o_totalprice " +
            "from {{ ref('stg_orders') }} where o_orderstatus = 'O'"),
        "mart_segment_revenue" ->
          ("select c.c_mktsegment as mktsegment, count(*) as n_orders, " +
            "sum(cast(round(o.o_totalprice * 100, 0) as bigint)) as revenue_cents " +
            "from {{ ref('stg_open_orders') }} o " +
            "join {{ source('raw', 'customer') }} c " +
            "on o.o_custkey = c.c_custkey " +
            "group by c.c_mktsegment")),
      sources = Map("orders" -> t.orders, "customer" -> t.customer))
    out("mart_segment_revenue")
  }
}
