package graft.queries

/** DuckDB oracles for [[TpchQueries]] — the adapted TPC-H remainder.
  * Written in each query's ORIGINAL idiom (correlated subqueries,
  * EXISTS/NOT IN, scalar subqueries) so the oracle documents the
  * declarative form whose decorrelated plan the Spark side builds
  * explicitly. Numeric discipline as everywhere: doubles aggregate
  * through exact scaled integers; DuckDB's HUGEINT sums are cast back
  * to BIGINT wherever a sum reaches the output or a comparison;
  * year() is cast to INTEGER to match Spark's int. */
object TpchOracles {

  val all: Map[String, String] = Map(

    "q_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         MIN(ROUND(l_extendedprice / l_quantity, 2)) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |euro AS (
        |  SELECT p_partkey, p_brand, s_acctbal, s_name, n_name, cost
        |  FROM ps
        |  JOIN part ON p_partkey = l_partkey
        |   AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, cost
        |FROM euro e1
        |WHERE cost = (SELECT MIN(cost) FROM euro e2 WHERE e2.p_partkey = e1.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_tpch_q6" ->
      """SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 10000, 0) AS BIGINT)) / 100.0
        |         AS revenue_x100
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0
        |    AS revenue_x100
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
        |        THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
        |        ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT)
        |    AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
        |                  - 0.1 * p_retailprice * l_quantity) * 100, 0) AS BIGINT)) / 100.0
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0
        |    AS revenue_x100
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_x100 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_tpch_q11" ->
      """WITH byPart AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11'))
        |  GROUP BY 1)
        |SELECT l_partkey AS ps_partkey, value_c / 100.0 AS value
        |FROM byPart
        |WHERE CAST(value_c AS DOUBLE) >
        |      0.001 * CAST((SELECT CAST(SUM(value_c) AS BIGINT) FROM byPart) AS DOUBLE)""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q_tpch_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)
        |        ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT)
        |    AS promo_revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,

    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT)
        |      AS total_revenue_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_c / 10000.0 AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue_c = (SELECT MAX(total_revenue_c) FROM revenue)""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q_tpch_q19" ->
      """SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 100.0
        |         AS revenue_x100
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q20" ->
      """SELECT s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_nationkey < 5
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM (SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
        |        FROM lineitem
        |        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |        GROUP BY 1, 2) sq
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'hot%' AND qty > 40)""".stripMargin,

    "q_tpch_q22" ->
      """WITH sel AS (
        |  SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
        |  FROM customer WHERE c_nationkey % 10 IN (0, 3, 5, 7, 9))
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) / 100.0 AS totacctbal
        |FROM sel
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
        |           / COUNT(*) / 100.0
        |    FROM sel WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |          WHERE o_custkey = c_custkey
        |            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntrycode""".stripMargin
  )
}
