package graft.queries

/** DuckDB oracle SQL, one entry per SQL-expressible query in
  * SparkEntry.queries. Runs against the same parquet tables. Mirrors
  * the Spark side exactly — same arithmetic shape and operation order
  * so doubles are bit-identical; integer-typed outputs cast to match
  * Spark's types (DuckDB year()/length() return BIGINT, Spark INT).
  * DuckDB regexp_replace needs the 'g' flag to match Spark's
  * replace-all semantics.
  */
object OperatorOracles {

  /** q_haversine_spheroid replay: Vincenty inverse unrolled to
    * [[graft.expressions.VincentyDistance.Iters]] iterations, every
    * constant injected from the engine's own object so the two sides
    * cannot desynchronize. One CTE per iteration; DuckDB's lateral
    * column-alias references keep each step readable. Operation order
    * mirrors VincentyDistance.meters token for token. */
  private def vincentyMilesSql: String = {
    val V = graft.expressions.VincentyDistance
    val RAD = V.Rad.toString
    val F = (1.0 / V.InverseFlattening).toString
    val A = V.SemiMajorA.toString
    val B = V.SemiMinorB.toString
    val n = V.Iters
    val iters = (1 to n).map { k =>
      val p = k - 1
      s""",
        |i$k AS (SELECT *,
        |  sin(lam$p) AS sinL$k, cos(lam$p) AS cosL$k,
        |  cosU2 * sinL$k AS t1_$k,
        |  cosU1 * sinU2 - sinU1 * cosU2 * cosL$k AS t2_$k,
        |  sqrt(t1_$k * t1_$k + t2_$k * t2_$k) AS sins$k,
        |  sinU1 * sinU2 + cosU1 * cosU2 * cosL$k AS coss$k,
        |  atan2(sins$k, coss$k) AS sig$k,
        |  CASE WHEN sins$k = 0.0 THEN 0.0 ELSE cosU1 * cosU2 * sinL$k / sins$k END AS sina$k,
        |  1.0 - sina$k * sina$k AS c2a$k,
        |  CASE WHEN c2a$k = 0.0 THEN 0.0 ELSE coss$k - 2.0 * sinU1 * sinU2 / c2a$k END AS c2sm$k,
        |  fc / 16.0 * c2a$k * (4.0 + fc * (4.0 - 3.0 * c2a$k)) AS cc$k,
        |  bigL + (1.0 - cc$k) * fc * sina$k * (sig$k + cc$k * sins$k * (c2sm$k + cc$k * coss$k * (-1.0 + 2.0 * c2sm$k * c2sm$k))) AS lam$k
        | FROM i$p)""".stripMargin
    }.mkString
    s"""WITH pts AS (
      |  SELECT c_custkey,
      |    CAST((c_custkey % 120) - 60 + 0.25 AS DOUBLE) AS lat1,
      |    CAST((c_custkey % 300) - 150 + 0.5 AS DOUBLE) AS lon1,
      |    CAST((n_nationkey % 100) - 50 + 0.75 AS DOUBLE) AS lat2,
      |    CAST((n_nationkey * 13 % 330) - 165 + 0.25 AS DOUBLE) AS lon2
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |i0 AS (SELECT c_custkey,
      |  CAST($RAD AS DOUBLE) AS radc, CAST($F AS DOUBLE) AS fc,
      |  (lon2 - lon1) * radc AS bigL,
      |  sin(atan((1.0 - fc) * tan(lat1 * radc))) AS sinU1,
      |  cos(atan((1.0 - fc) * tan(lat1 * radc))) AS cosU1,
      |  sin(atan((1.0 - fc) * tan(lat2 * radc))) AS sinU2,
      |  cos(atan((1.0 - fc) * tan(lat2 * radc))) AS cosU2,
      |  (lon2 - lon1) * radc AS lam0
      | FROM pts)$iters,
      |fin AS (SELECT c_custkey,
      |  c2a$n * (CAST($A AS DOUBLE) * CAST($A AS DOUBLE) - CAST($B AS DOUBLE) * CAST($B AS DOUBLE)) / (CAST($B AS DOUBLE) * CAST($B AS DOUBLE)) AS uu,
      |  1.0 + uu / 16384.0 * (4096.0 + uu * (-768.0 + uu * (320.0 - 175.0 * uu))) AS bigA,
      |  uu / 1024.0 * (256.0 + uu * (-128.0 + uu * (74.0 - 47.0 * uu))) AS bigB,
      |  bigB * sins$n * (c2sm$n + bigB / 4.0 * (coss$n * (-1.0 + 2.0 * c2sm$n * c2sm$n) - bigB / 6.0 * c2sm$n * (-3.0 + 4.0 * sins$n * sins$n) * (-3.0 + 4.0 * c2sm$n * c2sm$n))) AS dsig,
      |  CASE WHEN sins$n = 0.0 THEN 0.0 ELSE CAST($B AS DOUBLE) * bigA * (sig$n - dsig) END AS meters
      | FROM i$n)
      |SELECT c_custkey, round(meters / 1609.34, 4) AS dist_mi,
      |  CASE WHEN round(meters / 1609.34, 4) > 10 THEN 'far' ELSE 'near' END AS proximity
      |FROM fin""".stripMargin
  }

  val all: Map[String, String] = Map(
    // ephemeral-materialization replay: the two inlined staging CTEs
    // compose to one filtered join-aggregate — the oracle runs the
    // composition directly (inline-as-CTE must be semantically
    // invisible)
    "q_ephemeral_cte" ->
      """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
        |            AS BIGINT) AS revenue_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus = 'O'
        |GROUP BY c.c_mktsegment""".stripMargin,
    // incremental/CDC fold replay: same base slice, same change batch,
    // latest-by-seq per key with delete-beats-stale — checks the
    // MATERIALIZED table Incremental.merge/applyChanges produced
    "q_incremental_merge" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |           FROM orders),
        |base AS (SELECT * FROM o WHERE o_orderkey % 7 != 0),
        |changes AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 1000.0 AS o_totalprice, 'U' AS op, 2 AS seq
        |  FROM o WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'I', 1
        |  FROM o WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'D', 3
        |  FROM o WHERE o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice - 500.0, 'U', 1
        |  FROM o WHERE o_orderkey % 13 = 0),
        |latest AS (SELECT * FROM changes
        |  QUALIFY row_number() OVER (PARTITION BY o_orderkey
        |                             ORDER BY seq DESC, op) = 1)
        |SELECT * FROM base
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM latest WHERE op != 'D'""".stripMargin,

    // aggRefresh ≡ one-shot recompute: scalar rollup + the HLL
    // register replica (same md5-60 / format('{:b}') machinery the
    // q_hll_distinct oracle proved)
    "q_agg_refresh" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) AS val,
        |    CAST(user_id AS VARCHAR) AS dk FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(val) AS BIGINT) AS sum_micro,
        |    min(val) AS min_micro, max(val) AS max_micro
        |  FROM e GROUP BY 1),
        |h AS (SELECT event_type,
        |    CAST(concat('0x', substr(md5('hll|' || dk), 1, 15)) AS BIGINT)
        |      AS hv FROM e),
        |r AS (SELECT event_type, hv % 256 AS reg,
        |    CAST(least(53 - length(format('{:b}', hv // 256)), 32)
        |      AS BIGINT) AS rho FROM h),
        |mx AS (SELECT event_type, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
        |agg AS (SELECT event_type,
        |    CAST(sum(CAST(1 AS BIGINT) << (32 - mj)) AS BIGINT)
        |      + (256 - count(*)) * 4294967296 AS est_scaled,
        |    CAST(256 - count(*) AS BIGINT) AS v
        |  FROM mx GROUP BY 1),
        |est AS (SELECT event_type, v,
        |    (718273 * (281474976710656 // est_scaled)) // 1000000
        |      AS raw_est FROM agg)
        |SELECT s.event_type, s.cnt, s.sum_micro, s.min_micro, s.max_micro,
        |  est.v, est.raw_est,
        |  CASE WHEN est.v > 0 AND est.raw_est <= 640
        |       THEN CAST(round(256 * ln(256.0 / est.v), 0) AS BIGINT)
        |       ELSE est.raw_est END AS hll_est
        |FROM s JOIN est ON s.event_type = est.event_type""".stripMargin,

    // insert_overwrite fold: replaced months come ONLY from the batch,
    // untouched months ONLY from the base
    "q_insert_overwrite" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice,
        |    substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS month FROM orders),
        |batch AS (SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
        |    month FROM base
        |  WHERE month IN ('1995-03', '1995-04') AND o_orderkey % 2 = 0)
        |SELECT * FROM base WHERE month NOT IN ('1995-03', '1995-04')
        |UNION ALL SELECT * FROM batch""".stripMargin,

    // guarded CDC fold: final live view computed per key in one CASE;
    // the %4 branch deliberately ABSENT (its +999 replay arrived at a
    // lower seq than the persisted one and must not apply) and the %3
    // keys deleted — a hash match proves the on-disk seq guard and
    // tombstones held across the two folds
    "q_cdc_guarded" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 7.0
        |       WHEN o_orderkey % 2 = 0 THEN o_totalprice + 100.0
        |       ELSE o_totalprice END AS v
        |FROM orders WHERE o_orderkey % 3 <> 0""".stripMargin,

    // guarded CDC compaction at horizon 9: %3 tombstones (seq 9) are
    // gone, %7 tombstones (seq 12, carrying the delete row's original
    // value) survive, live rows keep their winning forward-only seq
    "q_cdc_compact" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice
        |       WHEN o_orderkey % 5 = 0 THEN o_totalprice + 7.0
        |       WHEN o_orderkey % 2 = 0 THEN o_totalprice + 100.0
        |       ELSE o_totalprice END AS v,
        |  CAST(CASE WHEN o_orderkey % 7 = 0 THEN 12
        |       WHEN o_orderkey % 5 = 0 THEN 5
        |       WHEN o_orderkey % 2 = 0 THEN 3
        |       ELSE 1 END AS INTEGER) AS "__seq",
        |  (o_orderkey % 7 = 0) AS "__deleted"
        |FROM orders WHERE o_orderkey % 3 <> 0 OR o_orderkey % 7 = 0""".stripMargin,

    // change feed: I/D by anti-join, U by value inequality
    "q_change_feed" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |oldv AS (SELECT * FROM o WHERE o_orderkey % 3 <> 0),
        |newv AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 7 <> 0)
        |SELECT 'I' AS op, n.o_orderkey, n.o_orderstatus, n.o_totalprice
        |FROM newv n LEFT JOIN oldv v ON n.o_orderkey = v.o_orderkey
        |WHERE v.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'D', v.o_orderkey, v.o_orderstatus, v.o_totalprice
        |FROM oldv v LEFT JOIN newv n ON n.o_orderkey = v.o_orderkey
        |WHERE n.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'U', n.o_orderkey, n.o_orderstatus, n.o_totalprice
        |FROM newv n JOIN oldv v ON n.o_orderkey = v.o_orderkey
        |WHERE n.o_orderstatus <> v.o_orderstatus
        |   OR n.o_totalprice <> v.o_totalprice""".stripMargin,

    // SCD2 as-of between the two rounds == exactly the round-1 table
    "q_scd2_asof" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 3 <> 0""".stripMargin,

    // SCD2 snapshot fold: replay the two batches with value-equality
    // joins (engine's md5 change-hash ⟺ value equality); four paths —
    // still-open from t1, closed-changed, closed-deleted, opened at t2
    "q_scd2_snapshot" ->
      """WITH base1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |base2 AS (SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |still AS (SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice,
        |    TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
        |  FROM base1 s JOIN base2 b ON s.o_orderkey = b.o_orderkey
        |    AND s.o_orderstatus = b.o_orderstatus
        |    AND s.o_totalprice = b.o_totalprice),
        |closing AS (SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice,
        |    TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |    TIMESTAMP '2024-02-01 00:00:00' AS valid_to, false AS is_current
        |  FROM base1 s LEFT JOIN base2 b ON s.o_orderkey = b.o_orderkey
        |    AND s.o_orderstatus = b.o_orderstatus
        |    AND s.o_totalprice = b.o_totalprice
        |  WHERE b.o_orderkey IS NULL),
        |opening AS (SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice,
        |    TIMESTAMP '2024-02-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
        |  FROM base2 b LEFT JOIN still s ON b.o_orderkey = s.o_orderkey
        |  WHERE s.o_orderkey IS NULL)
        |SELECT * FROM still UNION ALL SELECT * FROM closing
        |UNION ALL SELECT * FROM opening""".stripMargin,

    // ----- aggregations --------------------------------------------------
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 AS sum_base_price,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0 AS sum_disc_price_x100,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0 AS revenue_x100
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_x100 DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0 AS revenue_x100
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name IN ('AMERICA', 'ASIA')
        |GROUP BY n_name""".stripMargin,

    // Q18: the salt columns never reach the output — the oracle's
    // plain join proves the salted path is semantics-preserving.
    "q_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem
        |             GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 250),
        |qty AS (SELECT l_orderkey,
        |          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |        FROM lineitem JOIN big USING (l_orderkey) GROUP BY 1)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM qty JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_salted_agg" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_tpch_q17" ->
      """WITH avgq AS (SELECT l_partkey,
        |    0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) AS thr
        |  FROM lineitem GROUP BY 1)
        |SELECT SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#12' AND p_size < 15
        |JOIN avgq USING (l_partkey)
        |WHERE l_quantity < thr""".stripMargin,

    "q_tpch_q21" ->
      """WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem
        |              JOIN orders ON o_orderkey = l_orderkey
        |              WHERE o_orderstatus = 'F'
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name""".stripMargin,

    "q_agg_having_countdistinct" ->
      """SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem GROUP BY l_orderkey
        |HAVING COUNT(DISTINCT l_suppkey) > 3""".stripMargin,

    "q_dedup_groupby" ->
      "SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",

    "q_scalar_score" ->
      """SELECT c_custkey,
        |  (CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN c_mktsegment IS NOT NULL THEN 1 ELSE 0 END
        |   + CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END
        |   + CASE WHEN c_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS score
        |FROM customer""".stripMargin,

    "q_agg_stats" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n,
        |  COUNT(DISTINCT o_custkey) AS n_cust,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0 / COUNT(*) AS avg_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // ----- projections / filters ----------------------------------------
    "q_proj_alias" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |  l_quantity AS qty,
        |  l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem""".stripMargin,

    "q_star_except" ->
      "SELECT * EXCLUDE (p_retailprice) FROM part",

    "q_filter_in" ->
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_size IN (1,5,10,15) AND p_type IN ('ECONOMY','SMALL')""".stripMargin,

    "q_filter_cmp_null" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus != 'F' AND o_totalprice > 150000
        |  AND o_custkey IS NOT NULL""".stripMargin,

    "q_like" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_name LIKE '%00001%'
        |   OR (c_mktsegment LIKE 'B%' AND lower(c_name) LIKE '%customer%7')""".stripMargin,

    // ----- joins ---------------------------------------------------------
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q_join_multi" ->
      """SELECT c_mktsegment, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_residual" ->
      """SELECT l_orderkey, l_partkey, p_size
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND p_size IN (1,5,10)""".stripMargin,

    "q_join_left_chain" ->
      """SELECT c_custkey, n_name, r_name
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "q_join_expr" ->
      """SELECT c_custkey, seg_uc
        |FROM customer
        |JOIN (SELECT DISTINCT upper(c_mktsegment) AS seg_uc FROM customer) d
        |  ON lower(trim(c_mktsegment)) = lower(trim(seg_uc))""".stripMargin,

    "q_join_exists_flag" ->
      """SELECT o_orderkey, (debt_key IS NOT NULL) AS cust_low_bal
        |FROM orders
        |LEFT JOIN (SELECT c_custkey AS debt_key FROM customer WHERE c_acctbal < 500) d
        |  ON o_custkey = debt_key""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    // ----- windows / sort / set ops --------------------------------------
    "q_window_top1" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,

    "q_window_agg_rank" ->
      """SELECT l_partkey, l_suppkey, qty FROM (
        |  SELECT l_partkey, l_suppkey, qty,
        |    row_number() OVER (PARTITION BY l_partkey
        |                       ORDER BY qty DESC, l_suppkey) AS rn
        |  FROM (SELECT l_partkey, l_suppkey,
        |          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |        FROM lineitem GROUP BY l_partkey, l_suppkey) a) t
        |WHERE rn = 1""".stripMargin,

    "q_sort_global_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_union_all_typed_nulls" ->
      """SELECT c_custkey AS entity_id, c_name AS entity_name,
        |  CAST(NULL AS DOUBLE) AS total, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT o_custkey, CAST(NULL AS VARCHAR), o_totalprice, 'order' FROM orders""".stripMargin,

    // ----- scalar functions ----------------------------------------------
    "q_string_funcs" ->
      """SELECT c_custkey,
        |  lower(c_name) AS name_lower,
        |  lower(trim(c_name)) || '-' || c_mktsegment AS tagged,
        |  substr(c_name, 1, 9) AS name_prefix,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  CASE WHEN regexp_matches(c_name, '[13579]$') THEN 'odd' ELSE 'even' END AS key_parity,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_coal,
        |  CAST(length(c_name) AS INTEGER) AS name_len
        |FROM customer""".stripMargin,

    "q_case_buckets" ->
      """WITH tagged AS (
        |  SELECT c_custkey,
        |    CASE CAST(c_custkey % 11 AS INTEGER)
        |      WHEN 0 THEN NULL
        |      WHEN 1 THEN 'Prefer not to say'
        |      WHEN 2 THEN 'White'
        |      WHEN 3 THEN 'White, Black or African American'
        |      WHEN 4 THEN 'Hispanic or Latinx'
        |      WHEN 5 THEN 'South Asian'
        |      WHEN 6 THEN 'Native Hawaiian or other Pacific Islander'
        |      WHEN 7 THEN 'Other'
        |      WHEN 8 THEN 'White, Hispanic or Latinx, Other'
        |      WHEN 9 THEN 'Black or African American'
        |      ELSE 'East Asian' END AS race_ethnicity,
        |    CASE CAST(c_custkey % 7 AS INTEGER)
        |      WHEN 0 THEN NULL
        |      WHEN 1 THEN 'Man'
        |      WHEN 2 THEN 'Woman'
        |      WHEN 3 THEN 'Man, Woman'
        |      WHEN 4 THEN 'Prefer not to say'
        |      WHEN 5 THEN 'Prefer to self-describe'
        |      ELSE 'Genderfluid' END AS gender
        |  FROM customer)
        |SELECT c_custkey, race_ethnicity, gender,
        |  CASE
        |    WHEN lower(race_ethnicity) LIKE '%prefer not to say%' OR race_ethnicity IS NULL THEN 'Prefer Not To Say'
        |    WHEN ( (CASE WHEN race_ethnicity LIKE '%White%' THEN 1 ELSE 0 END)
        |         + (CASE WHEN race_ethnicity LIKE '%Hispanic%' OR race_ethnicity LIKE '%Latinx%' THEN 1 ELSE 0 END)
        |         + (CASE WHEN race_ethnicity LIKE '%Black%' OR race_ethnicity LIKE '%African American%' THEN 1 ELSE 0 END)
        |         + (CASE WHEN race_ethnicity LIKE '%South Asian%' OR race_ethnicity LIKE '%East Asian%' THEN 1 ELSE 0 END)
        |         + (CASE WHEN race_ethnicity LIKE '%Native Hawaiian or other Pacific Islander%' THEN 1 ELSE 0 END)
        |         + (CASE WHEN race_ethnicity LIKE '%Native American or Alaska Native' THEN 1 ELSE 0 END)
        |         + (CASE WHEN race_ethnicity LIKE '%Other%' THEN 1 ELSE 0 END) ) > 1 THEN 'Multiracial'
        |    WHEN race_ethnicity LIKE 'Hispanic or Latinx' THEN 'Hispanic'
        |    WHEN race_ethnicity LIKE 'Black or African American' THEN 'Black'
        |    WHEN race_ethnicity LIKE '%South Asian%' OR race_ethnicity LIKE '%East Asian%' THEN 'Asian'
        |    WHEN race_ethnicity LIKE 'Native Hawaiian or other Pacific Islander' THEN 'Native Hawaiian or other Pacific Islander'
        |    WHEN race_ethnicity LIKE 'Native American or Alaska Native' THEN 'Native American or Alaska Native'
        |    WHEN race_ethnicity LIKE 'White' THEN 'White'
        |    WHEN race_ethnicity LIKE 'Other' THEN 'Other'
        |    ELSE 'Other' END AS race,
        |  CASE
        |    WHEN gender LIKE '%Prefer not to say%' OR gender IS NULL THEN 'Prefer Not To Say'
        |    WHEN gender LIKE '%Prefer to self-describe%' THEN 'Prefer Not To Say'
        |    WHEN gender LIKE '%Man%' AND gender LIKE '%Woman%' THEN 'Prefer Not To Say'
        |    WHEN gender LIKE '%Man%' THEN 'Man'
        |    WHEN gender LIKE '%Woman%' THEN 'Woman'
        |    ELSE 'Non-binary' END AS gender_sum
        |FROM tagged""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  strftime(o_orderdate, '%m%d') AS mmdd,
        |  CAST(year(DATE '2026-08-12') - year(o_orderdate) AS INTEGER) AS bq_year_diff,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-08-12') AS INTEGER) AS days_to_asof
        |FROM orders""".stripMargin,

    "q_age_composite" ->
      """WITH b AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 17 = 0 THEN NULL
        |         WHEN c_custkey % 23 = 0 THEN 'garbage'
        |         ELSE lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0')
        |              || '-' || CAST(c_custkey % 60 + 1950 AS VARCHAR) END AS birthday
        |  FROM customer)
        |SELECT c_custkey, birthday,
        |  CAST(CASE WHEN birthday IS NULL THEN NULL
        |    ELSE year(DATE '2026-08-12')
        |         - year(CAST(try_strptime(substr(birthday,4,4) || '-' || substr(birthday,1,2) || '-01', '%Y-%m-%d') AS DATE))
        |         - (CASE WHEN strftime(DATE '2026-08-12', '%m%d') < substr(birthday,1,2) || '01'
        |                 THEN 1 ELSE 0 END)
        |    END AS INTEGER) AS age
        |FROM b""".stripMargin,

    "q_geo_radius" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    (c_custkey % 120) - 60 + 0.25 AS lat,
        |    (c_custkey % 300) - 150 + 0.5 AS lon
        |  FROM customer)
        |SELECT c_custkey,
        |  round(3958.7613 * 2 * asin(sqrt(
        |    pow(sin(radians(10.25 - lat) / 2), 2)
        |    + cos(radians(lat)) * cos(radians(10.25)) * pow(sin(radians(20.5 - lon) / 2), 2)
        |  )), 4) AS dist_mi
        |FROM pts
        |WHERE 3958.7613 * 2 * asin(sqrt(
        |    pow(sin(radians(10.25 - lat) / 2), 2)
        |    + cos(radians(lat)) * cos(radians(10.25)) * pow(sin(radians(20.5 - lon) / 2), 2)
        |  )) <= 3500.0""".stripMargin,

    "q_haversine" ->
      """WITH pts AS (
        |  SELECT c_custkey,
        |    (c_custkey % 120) - 60 + 0.25 AS lat1,
        |    (c_custkey % 300) - 150 + 0.5 AS lon1,
        |    (n_nationkey % 100) - 50 + 0.75 AS lat2,
        |    (n_nationkey * 13 % 330) - 165 + 0.25 AS lon2
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT c_custkey,
        |  round(3958.7613 * 2 * asin(sqrt(
        |    pow(sin(radians(lat2 - lat1) / 2), 2)
        |    + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
        |  )), 4) AS dist_mi,
        |  CASE WHEN round(3958.7613 * 2 * asin(sqrt(
        |    pow(sin(radians(lat2 - lat1) / 2), 2)
        |    + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
        |  )), 4) > 10 THEN 'far' ELSE 'near' END AS proximity
        |FROM pts""".stripMargin,

    // Spheroid replay: the Vincenty λ fixed-point unrolled to the SAME
    // fixed iteration count the engine runs, generated from the SAME
    // WGS84/Rad constants (graft.expressions.VincentyDistance), with
    // squares written x*x and the degree→radian multiply using the
    // injected Rad literal — never pow()/radians(), whose operation
    // orders differ between engines. Residual divergence is libm trig
    // ULPs, far under the 4dp output rounding.
    "q_haversine_spheroid" -> vincentyMilesSql,

    "q_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  COUNT(*) AS n,
        |  SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // ----- analytics breadth --------------------------------------------
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  NULLIF(COUNT(*) FILTER (o_orderstatus = 'F'), 0) AS "F",
        |  NULLIF(COUNT(*) FILTER (o_orderstatus = 'O'), 0) AS "O",
        |  NULLIF(COUNT(*) FILTER (o_orderstatus = 'P'), 0) AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // hierarchy flatten: DuckDB runs the real recursive CTE; BFS
    // first-arrival in the engine == MIN(depth) here
    "q_hierarchy_flatten" ->
      """WITH RECURSIVE edges AS (
        |  SELECT o_orderkey + 1000000 AS child, o_custkey AS parent
        |  FROM orders
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey + 100000 FROM customer
        |  UNION ALL
        |  SELECT n_nationkey + 100000, n_regionkey + 200000 FROM nation),
        |anc AS (
        |  SELECT DISTINCT child AS node, parent AS ancestor, 1 AS depth
        |  FROM edges
        |  UNION ALL
        |  SELECT a.node, e.parent, a.depth + 1
        |  FROM anc a JOIN edges e ON a.ancestor = e.child)
        |SELECT node, ancestor, CAST(MIN(depth) AS INTEGER) AS depth
        |FROM anc GROUP BY 1, 2""".stripMargin,

    // multi-touch attribution: integer-micro money, truncating split
    // (positive values, so // == Spark's div), rank/count windows per
    // purchase
    "q_attribution" ->
      """WITH clicks AS (SELECT user_id, event_id AS click_id, ts AS cts
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, event_id AS purchase_id, ts AS pts,
        |    CAST(round(value * 1000000) AS BIGINT) AS value_micro
        |  FROM events WHERE event_type = 'purchase'),
        |pairs AS (SELECT c.user_id, c.click_id, p.value_micro,
        |    row_number() OVER (PARTITION BY p.purchase_id
        |                       ORDER BY c.cts, c.click_id) AS rn,
        |    count(*) OVER (PARTITION BY p.purchase_id) AS n
        |  FROM clicks c JOIN purchases p ON c.user_id = p.user_id
        |    AND c.cts <= p.pts AND c.cts >= p.pts - INTERVAL 7 DAY)
        |SELECT user_id, click_id,
        |  CAST(sum(value_micro // n) AS BIGINT) AS linear_micro,
        |  CAST(sum(CASE WHEN rn = 1 THEN value_micro ELSE 0 END) AS BIGINT)
        |    AS first_micro,
        |  CAST(sum(CASE WHEN rn = n THEN value_micro ELSE 0 END) AS BIGINT)
        |    AS last_micro
        |FROM pairs GROUP BY 1, 2""".stripMargin,

    // RFM quintiles via broadcast quantile_cont cutoffs (no global
    // ntile window); recency inverted so fresher = higher
    "q_rfm" ->
      """WITH per_cust AS (SELECT o_custkey,
        |    date_diff('day', max(o_orderdate), DATE '1998-12-31') AS r_days,
        |    count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS m_cents
        |  FROM orders GROUP BY 1),
        |cuts AS (SELECT
        |    quantile_cont(r_days, 0.2) AS r2, quantile_cont(r_days, 0.4) AS r4,
        |    quantile_cont(r_days, 0.6) AS r6, quantile_cont(r_days, 0.8) AS r8,
        |    quantile_cont(freq, 0.2) AS f2, quantile_cont(freq, 0.4) AS f4,
        |    quantile_cont(freq, 0.6) AS f6, quantile_cont(freq, 0.8) AS f8,
        |    quantile_cont(m_cents, 0.2) AS m2, quantile_cont(m_cents, 0.4) AS m4,
        |    quantile_cont(m_cents, 0.6) AS m6, quantile_cont(m_cents, 0.8) AS m8
        |  FROM per_cust)
        |SELECT o_custkey, CAST(r_days AS INTEGER) AS r_days, freq, m_cents,
        |  6 - (1 + (r_days > r2)::INT + (r_days > r4)::INT
        |         + (r_days > r6)::INT + (r_days > r8)::INT) AS r,
        |  1 + (freq > f2)::INT + (freq > f4)::INT
        |    + (freq > f6)::INT + (freq > f8)::INT AS f,
        |  1 + (m_cents > m2)::INT + (m_cents > m4)::INT
        |    + (m_cents > m6)::INT + (m_cents > m8)::INT AS m,
        |  (6 - (1 + (r_days > r2)::INT + (r_days > r4)::INT
        |          + (r_days > r6)::INT + (r_days > r8)::INT)) * 100
        |  + (1 + (freq > f2)::INT + (freq > f4)::INT
        |       + (freq > f6)::INT + (freq > f8)::INT) * 10
        |  + (1 + (m_cents > m2)::INT + (m_cents > m4)::INT
        |       + (m_cents > m6)::INT + (m_cents > m8)::INT) AS rfm_score
        |FROM per_cust, cuts""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_array_agg" ->
      """SELECT s_nationkey,
        |  array_to_string(list_transform(list_slice(list_sort(list(s_suppkey)), 1, 5),
        |    x -> CAST(x AS VARCHAR)), ',') AS first_ids,
        |  string_agg(s_name, ',' ORDER BY s_name) AS names_csv
        |FROM supplier GROUP BY s_nationkey""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9""".stripMargin,

    "q_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |      FROM (SELECT doc_id,
        |              list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '') AS toks
        |            FROM documents WHERE doc_id < 50) t) u""".stripMargin,

    "q_events_props" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k
        |FROM events""".stripMargin,

    "q_tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                                    x -> x != '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, tfidf, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY tfidf DESC, term) AS rn
        |  FROM scored) t WHERE rn <= 3""".stripMargin,

    // full 3-iteration integer-micro PageRank replay: contribution =
    // rank // out-degree, damping = 150000 + 85·inflow // 100 — both
    // truncating division, which Spark `div` and DuckDB `//` agree on
    "q_pagerank" ->
      """WITH li AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
        |            FROM lineitem),
        |e AS (SELECT p AS src, s AS dst FROM li
        |      UNION ALL SELECT s AS src, p AS dst FROM li),
        |deg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |          UNION SELECT DISTINCT dst AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        |i1 AS (SELECT e.dst AS node, sum(r0.r // deg.odeg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(i1.inflow, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i1 USING (node)),
        |i2 AS (SELECT e.dst AS node, sum(r1.r // deg.odeg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(i2.inflow, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i2 USING (node)),
        |i3 AS (SELECT e.dst AS node, sum(r2.r // deg.odeg) AS inflow
        |       FROM e JOIN deg USING (src) JOIN r2 ON r2.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |         CAST(150000 + (85 * coalesce(i3.inflow, 0)) // 100 AS BIGINT) AS r
        |       FROM nodes n LEFT JOIN i3 USING (node))
        |SELECT node, r AS rank_micro FROM r3""".stripMargin,

    // deterministic synchronous LPA, 3 rounds unrolled: adopt the most
    // frequent neighbor label, ties to the smallest label
    "q_label_prop" ->
      """WITH li AS (SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |            FROM lineitem),
        |e AS (SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM li UNION ALL SELECT dst AS src, src AS dst FROM li) x
        |  WHERE src != dst),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |l0 AS (SELECT node, node AS label FROM n),
        |r1 AS (SELECT node, label FROM (
        |    SELECT e.src AS node, l.label, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY e.src
        |        ORDER BY count(*) DESC, l.label) AS rn
        |    FROM e JOIN l0 l ON l.node = e.dst GROUP BY e.src, l.label) t
        |  WHERE rn = 1),
        |r2 AS (SELECT node, label FROM (
        |    SELECT e.src AS node, l.label, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY e.src
        |        ORDER BY count(*) DESC, l.label) AS rn
        |    FROM e JOIN r1 l ON l.node = e.dst GROUP BY e.src, l.label) t
        |  WHERE rn = 1),
        |r3 AS (SELECT node, label FROM (
        |    SELECT e.src AS node, l.label, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY e.src
        |        ORDER BY count(*) DESC, l.label) AS rn
        |    FROM e JOIN r2 l ON l.node = e.dst GROUP BY e.src, l.label) t
        |  WHERE rn = 1)
        |SELECT node, label FROM r3""".stripMargin,

    // degree-oriented triangle count of the co-purchase graph: edges
    // oriented (deg, id)-ascending; wedge count = Σ C(outdeg, 2)
    "q_triangles" ->
      """WITH pairs AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) x
        |  GROUP BY node),
        |o AS (SELECT
        |    CASE WHEN (du.deg, p.u) > (dv.deg, p.v) THEN p.v ELSE p.u END AS src,
        |    CASE WHEN (du.deg, p.u) > (dv.deg, p.v) THEN p.u ELSE p.v END AS dst,
        |    CASE WHEN (du.deg, p.u) > (dv.deg, p.v) THEN du.deg ELSE dv.deg END AS ddeg
        |  FROM pairs p JOIN deg du ON du.node = p.u JOIN deg dv ON dv.node = p.v),
        |w AS (SELECT x.dst AS b, y.dst AS c FROM o x JOIN o y
        |      ON x.src = y.src AND (x.ddeg, x.dst) < (y.ddeg, y.dst)),
        |nw AS (SELECT CAST(sum(od * (od - 1) // 2) AS BIGINT) AS n_wedges FROM (
        |    SELECT src, count(*) AS od FROM o GROUP BY src) z),
        |nt AS (SELECT count(*) AS n_triangles FROM w
        |       JOIN o ON o.src = w.b AND o.dst = w.c)
        |SELECT (SELECT count(*) FROM pairs) AS n_edges,
        |       nw.n_wedges, nt.n_triangles
        |FROM nt CROSS JOIN nw""".stripMargin,

    // first-order Markov transitions over per-user event streams,
    // (ts, event_id)-ordered, exact integer-micro row normalization
    "q_event_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (SELECT event_type AS src, next_type AS dst,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT src, CAST(sum(n) AS BIGINT) AS row_n FROM t
        |      GROUP BY 1)
        |SELECT t.src, t.dst, t.n,
        |  (t.n * 1000000) // r.row_n AS p_micro
        |FROM t JOIN r USING (src)""".stripMargin,

    // 2-core by synchronous peeling, 8 rounds unrolled (converges in
    // <= 5 at the verified SFs; a deeper graph would hash-mismatch
    // and flag itself). MATERIALIZED per round or the chained CTEs
    // re-evaluate multiplicatively.
    "q_kcore" ->
      ("""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |p AS MATERIALIZED (SELECT a.pk AS src, b.pk AS dst
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS MATERIALIZED (SELECT src, dst FROM p
        |  UNION SELECT dst, src FROM p)""" +
        (1 to 8).map { n =>
          s""",
            |l$n AS MATERIALIZED (SELECT src FROM e${n - 1}
            |  GROUP BY src HAVING count(*) >= 2),
            |e$n AS MATERIALIZED (SELECT e.src, e.dst FROM e${n - 1} e
            |  JOIN l$n a ON a.src = e.src JOIN l$n b ON b.src = e.dst)"""
        }.mkString +
        """
          |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
          |FROM e8 GROUP BY 1""").stripMargin,

    // multi-source BFS, 3 min-relaxation rounds unrolled (equals the
    // engine's frontier BFS after the same number of rounds: frontier
    // assignment is first-reached = minimal hop count)
    "q_shortest_path" ->
      ("""WITH li AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
        |            FROM lineitem),
        |e AS MATERIALIZED (SELECT p AS src, s AS dst FROM li
        |      UNION ALL SELECT s AS src, p AS dst FROM li),
        |d0 AS (SELECT DISTINCT src AS node, 0 AS dist FROM e WHERE src % 200 = 0)""" +
        (1 to 3).map { n =>
          s""",
            |d$n AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
            |    SELECT node, dist FROM d${n - 1}
            |    UNION ALL SELECT e.dst AS node, d.dist + 1 AS dist
            |    FROM e JOIN d${n - 1} d ON d.node = e.src) x GROUP BY node)"""
        }.mkString +
        """
          |SELECT node, CAST(dist AS INT) AS dist FROM d3""").stripMargin,

    // deterministic random walks, steps unrolled: neighbor pick =
    // portable md5 hash60(start|walk|step) % out-degree over the
    // dst-rank-ordered adjacency — replays the engine's walks exactly.
    // Walk length / walks-per-node come from the SAME constants the
    // query passes to Graph.randomWalks (AdvancedAnalytics), so the
    // replay cannot drift from the engine parameters.
    "q_random_walks" ->
      (s"""WITH li AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
        |            FROM lineitem),
        |e AS (SELECT p AS src, s AS dst FROM li
        |      UNION ALL SELECT s AS src, p AS dst FROM li),
        |adj AS MATERIALIZED (SELECT src, dst,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS BIGINT) AS rk
        |  FROM e),
        |deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS odeg
        |  FROM adj GROUP BY src),
        |p0 AS (SELECT DISTINCT src AS start, w.walk, src AS node
        |  FROM e CROSS JOIN (SELECT unnest([${
            (0 until AdvancedAnalytics.randomWalksPerNode).mkString(", ")
          }]) AS walk) w
        |  WHERE src % 50 = 0)""" +
        (1 to AdvancedAnalytics.randomWalkLen).map { n =>
          s""",
            |p$n AS MATERIALIZED (SELECT p.start, p.walk, a.dst AS node
            |  FROM p${n - 1} p
            |  JOIN deg d ON d.src = p.node
            |  JOIN adj a ON a.src = p.node AND a.rk =
            |    CAST(concat('0x', substr(md5(concat(CAST(p.start AS VARCHAR), '|',
            |      CAST(p.walk AS VARCHAR), '|', '$n')), 1, 15)) AS BIGINT)
            |    % d.odeg + 1)"""
        }.mkString +
        """
          |SELECT start, walk, CAST(0 AS INT) AS step, node FROM p0""" +
        (1 to AdvancedAnalytics.randomWalkLen).map { n =>
          s"""
            |UNION ALL SELECT start, walk, CAST($n AS INT) AS step, node FROM p$n"""
        }.mkString).stripMargin,

    "q_zscore" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS p, COUNT(*) AS n,
        |    SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)) AS s1,
        |    SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
        |        * CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)) AS s2
        |  FROM orders GROUP BY 1),
        |stats AS (SELECT p, CAST(s1 AS DOUBLE) / n AS mean_c,
        |    sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n)) AS std_c
        |  FROM m)
        |SELECT o_orderkey, o_orderpriority,
        |  round((ROUND(o_totalprice * 100, 0) - mean_c) / std_c, 6) AS z
        |FROM orders JOIN stats ON o_orderpriority = p""".stripMargin,

    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, MIN(ts) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(ts) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts > t_view GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(ts) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts > t_click GROUP BY 1),
        |users AS (SELECT DISTINCT user_id FROM e)
        |SELECT (CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
        |      + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        |      + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS stage,
        |  COUNT(*) AS n_users
        |FROM users u
        |LEFT JOIN v ON u.user_id = v.user_id
        |LEFT JOIN c ON u.user_id = c.user_id
        |LEFT JOIN p ON u.user_id = p.user_id
        |GROUP BY 1""".stripMargin,

    "q_mode" ->
      """SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY COUNT(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity) t
        |WHERE rn = 1""".stripMargin,

    "q_monthly_growth" ->
      """WITH monthly AS (
        |  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |    SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, month,
        |  rev_cents / 100.0 AS revenue,
        |  round(CAST(rev_cents - prev AS DOUBLE) / prev, 6) AS mom_growth
        |FROM (SELECT *, lag(rev_cents) OVER (PARTITION BY o_orderpriority
        |                                     ORDER BY month) AS prev
        |      FROM monthly) t""".stripMargin,

    "q_gapfill" ->
      """WITH days AS (SELECT CAST(DATE '2024-01-01' + i * INTERVAL 1 DAY AS DATE) AS day
        |              FROM range(0, 30) t(i)),
        |users AS (SELECT DISTINCT user_id FROM events),
        |daily AS (SELECT user_id AS u, CAST(ts AS DATE) AS d, COUNT(*) AS n_actual
        |          FROM events GROUP BY 1, 2)
        |SELECT user_id, day, coalesce(n_actual, 0) AS n
        |FROM users CROSS JOIN days
        |LEFT JOIN daily ON user_id = u AND day = d""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN cohorts ON e.user_id = cohorts.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_lateral" ->
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin,

    "q_grouping_flags" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS TINYINT) AS g_prio
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_bit_aggs" ->
      """SELECT p_type,
        |  CAST(bit_and(p_size) AS INTEGER) AS band,
        |  CAST(bit_or(p_size) AS INTEGER) AS bor,
        |  CAST(bit_xor(p_size) AS INTEGER) AS bxor
        |FROM part GROUP BY p_type""".stripMargin,

    "q_misc_funcs" ->
      """SELECT n_nationkey,
        |  translate(n_name, 'AEIOU', 'aeiou') AS translated,
        |  upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2)) AS title,
        |  reverse(n_name) AS rev,
        |  repeat('ab', 3) AS rep,
        |  CAST(ascii(n_name) AS INTEGER) AS first_code,
        |  array_to_string(list_transform(
        |    list_sort(list_distinct([n_nationkey, n_regionkey, n_regionkey, n_regionkey * 2])),
        |    x -> CAST(x AS VARCHAR)), ',') AS keys_union
        |FROM nation""".stripMargin,

    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier""".stripMargin,

    "q_stats_moments" ->
      """WITH m AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)) AS s1,
        |    SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
        |        * CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)) AS s2
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n,
        |  round((CAST(s1 AS DOUBLE) / n) / 100.0, 4) AS mean,
        |  round((CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n)) / 10000.0, 4) AS var_pop,
        |  round(sqrt(round((CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n)) / 10000.0, 4)), 4) AS std_pop
        |FROM m""".stripMargin,

    "q_asof_join" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |rates AS (
        |  SELECT CAST(to_timestamp(h * 3600) AS TIMESTAMP) AS rate_ts,
        |         CAST(h % 97 AS INTEGER) AS rate
        |  FROM (SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
        |        FROM events) t
        |  WHERE h % 5 = 0)
        |SELECT e.event_id, e.ts, r.rate_ts, r.rate
        |FROM e ASOF LEFT JOIN rates r ON e.ts >= r.rate_ts""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER u AS INTEGER) AS rn,
        |  CAST(rank() OVER t AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER t AS INTEGER) AS drk,
        |  lag(o_totalprice, 1) OVER u AS prev_price,
        |  lead(o_totalprice, 1) OVER u AS next_price,
        |  first_value(o_orderkey) OVER u AS first_ok,
        |  CAST(ntile(4) OVER u AS INTEGER) AS quartile,
        |  round(percent_rank() OVER t, 6) AS pct_rank,
        |  round(cume_dist() OVER t, 6) AS cume
        |FROM orders
        |WINDOW u AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       t AS (PARTITION BY o_custkey ORDER BY o_orderdate)""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,

    "q_text_levenshtein" ->
      """WITH a AS (SELECT doc_id AS a_id, substr(lower(text), 1, 40) AS ta
        |           FROM documents WHERE doc_id % 7 = 0),
        |b AS (SELECT doc_id - 1 AS a_id, doc_id AS b_id,
        |        substr(lower(text), 1, 40) AS tb FROM documents)
        |SELECT a.a_id, b.b_id,
        |  CAST(levenshtein(ta, tb) AS INTEGER) AS lev,
        |  round(1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
        |        / greatest(length(ta), length(tb), 1), 6) AS sim_ratio
        |FROM a JOIN b USING (a_id)""".stripMargin,

    "q_exists_in_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin,

    "q_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT DISTINCT user_id AS v_user, CAST(ts AS TIMESTAMP) AS v_ts
        |      FROM events WHERE event_type = 'view')
        |SELECT event_id, ts, v_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.v_user AND p.ts >= v.v_ts""".stripMargin,

    // point-in-time feature assembly: two chained ASOF LEFT JOINs on
    // (user, ts<=label_ts), feature streams pre-deduped per (user,ts)
    "q_pit_features" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             value AS label_value
        |           FROM events WHERE event_type = 'purchase'),
        |ck AS (SELECT user_id AS ck_user, CAST(ts AS TIMESTAMP) AS ck_ts,
        |         max(value) AS ck_value
        |       FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |vw AS (SELECT user_id AS vw_user, CAST(ts AS TIMESTAMP) AS vw_ts,
        |         max(value) AS vw_value
        |       FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT event_id, user_id, ts, label_value,
        |  ck_ts, ck_value, vw_ts, vw_value
        |FROM p
        |ASOF LEFT JOIN ck ON p.user_id = ck.ck_user AND p.ts >= ck.ck_ts
        |ASOF LEFT JOIN vw ON p.user_id = vw.vw_user AND p.ts >= vw.vw_ts""".stripMargin,

    "q_range_join_bucketed" ->
      """WITH blocks AS (
        |  SELECT i AS block_id,
        |    TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 6 HOUR AS block_start,
        |    TIMESTAMP '2024-01-01 00:00:00' + (i + 1) * INTERVAL 6 HOUR AS block_end
        |  FROM range(0, 124) t(i))
        |SELECT block_id, COUNT(*) AS n,
        |  SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
        |FROM events e JOIN blocks b
        |  ON e.ts >= b.block_start AND e.ts < b.block_end
        |GROUP BY block_id""".stripMargin,

    "q_range_join" ->
      """WITH blocks AS (
        |  SELECT i AS block_id,
        |    TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 6 HOUR AS block_start,
        |    TIMESTAMP '2024-01-01 00:00:00' + (i + 1) * INTERVAL 6 HOUR AS block_end
        |  FROM range(0, 124) t(i))
        |SELECT block_id, COUNT(*) AS n,
        |  SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
        |FROM events e JOIN blocks b
        |  ON e.ts >= b.block_start AND e.ts < b.block_end
        |GROUP BY block_id""".stripMargin
  )
}
