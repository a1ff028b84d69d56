package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.ext.TextAnalysis

/** Second analytics batch: TF-IDF term weighting, exact z-score
  * normalization, sequential funnel analysis, per-group mode, and
  * period-over-period growth. All oracle-verified; doubles only ever
  * derive from exact integer aggregates or per-row arithmetic shared
  * with the oracle.
  */
object AdvancedAnalytics {

  /** q_random_walks parameters, shared with the OperatorOracles replay
    * builder so query and oracle cannot desynchronize (ADVICE r10). */
  val randomWalkLen = 4
  val randomWalksPerNode = 2

  /** Distinct co-purchase part pairs per order — (src < dst) for every
    * pair of distinct parts sharing an order. r18: ONE shuffle (the
    * per-order grouping) with pairs generated map-side from the sorted
    * distinct basket array, replacing the self-join shape that
    * shuffled+sorted the lineitem projection twice for a sort-merge
    * on l_orderkey. Identical pair SET per order (array_distinct +
    * ascending sort ⟺ the a.pk < b.pk join over distinct (ok, pk)
    * rows). Basket sizes in this schema are bounded (≤ 7 lineitems),
    * so per-row pair fanout is constant; the consumers dedup across
    * orders themselves. */
  def coPurchasePairs(li: DataFrame): DataFrame = li
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("parts"))
    .select(explode(expr(
      "flatten(transform(parts, (x, i) -> " +
        "transform(slice(parts, i + 2, size(parts) - i - 1), " +
        "y -> struct(x AS src, y AS dst))))")).as("p"))
    .select(col("p.src").as("src"), col("p.dst").as("dst"))

  /** TF-IDF with top-3 terms per document. tf/df/N are exact integer
    * counts; idf = ln(N/df) as the only transcendental, computed
    * identically on both sides. */
  def qTfidfTopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("doc_id", "term", "tf", "tfidf", "rn")
  }

  /** Z-score normalization per group from exact integer moments (the
    * q_stats_moments pattern, unrounded until the final 6dp). */
  def qZscore(spark: SparkSession, dir: String): DataFrame = {
    val c = round(col("o_totalprice") * 100, 0)
    val cd = c.cast(DecimalType(38, 0))
    val moments = Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(cd).as("s1"), sum(cd * cd).as("s2"))
      .select(col("o_orderpriority").as("p"),
        (col("s1").cast(DoubleType) / col("n")).as("mean_c"),
        sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast(DoubleType) /
          (col("n").cast(DoubleType) * col("n"))).as("std_c"))
    Tables(spark, dir).orders
      .join(broadcast(moments), col("o_orderpriority") === col("p"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        round((c - col("mean_c")) / col("std_c"), 6).as("z"))
  }

  /** Strict sequential funnel view -> click -> purchase per user:
    * each step's timestamp must follow the previous step's. Output:
    * furthest stage reached -> user count. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events.select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    val users = e.select("user_id").distinct()
    users
      .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1).as("s2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("s3")), Seq("user_id"), "left")
      .select(
        (coalesce(col("s1"), lit(0)) + coalesce(col("s2"), lit(0)) +
          coalesce(col("s3"), lit(0))).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition table over per-user event streams
    * — the product-analytics "where do users go next" matrix (and the
    * model behind Markov-chain attribution): adjacent event pairs in
    * (ts, event_id) order, row-normalized to exact integer-micro
    * probabilities (n·10⁶ div row total — no doubles, replay-exact).
    * Scale shape: lead() runs inside per-user windows (one user-keyed
    * shuffle, bounded frames — never a global sort), the transition
    * aggregate is event-type²-bounded, and the normalizer joins a
    * row-cardinality table back; nothing after the window is
    * event-stream-sized. */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val t = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val rows = t.groupBy("src").agg(sum(col("n")).as("row_n"))
    t.join(rows, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        expr("(n * 1000000) div row_n").as("p_micro"))
  }

  /** Mode (most frequent value) per group, deterministic tie-break on
    * the smaller value. */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
  }

  /** Month-over-month revenue growth per priority (lag window over
    * exact monthly cents). */
  def qMonthlyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(spark, dir).orders
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast(LongType)).as("rev_cents"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("month"))
    monthly
      .withColumn("prev", lag(col("rev_cents"), 1).over(w))
      .select(col("o_orderpriority"), col("month"),
        (col("rev_cents") / 100.0).as("revenue"),
        round((col("rev_cents") - col("prev")).cast(DoubleType) / col("prev"), 6)
          .as("mom_growth"))
  }

  /** 3-iteration damped PageRank over the undirected part↔supplier
    * sourcing graph (distinct (l_partkey, l_suppkey) pairs from
    * lineitem; part nodes even = 2·partkey, supplier nodes odd =
    * 2·suppkey+1). Integer-micro ranks — the DuckDB oracle replays
    * the full loop; see [[graft.operators.Graph.pageRank]]. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = li.select(col("p").as("src"), col("s").as("dst"))
      .union(li.select(col("s").as("src"), col("p").as("dst")))
    graft.operators.Graph.pageRank(edges, iters = 3)
  }

  /** TextRank top-20 corpus keywords — PageRank over the adjacent-token
    * co-occurrence graph; see [[graft.operators.Graph.textRank]]. */
  def qTextrank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.textRank(Tables(spark, dir).documents)

  /** HITS rounds — shared by the query and the oracle generator. */
  val hitsIters = 2

  /** HITS over the DIRECTED part→supplier sourcing graph: parts are
    * pure hubs, suppliers pure authorities (the bipartite direction
    * PageRank's symmetrized walk erases); see
    * [[graft.operators.Graph.hits]]. */
  def qHits(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    graft.operators.Graph.hits(li, iters = hitsIters)
  }

  /** Deterministic label-propagation communities over the
    * part↔supplier sourcing graph (same node encoding as
    * [[qPagerank]]); see [[graft.operators.Graph.labelPropagation]]. */
  def qLabelProp(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    graft.operators.Graph.labelPropagation(li, iters = 3)
  }

  /** Modularity of the LPA communities on the part↔supplier graph —
    * the community-quality measurement (same edges and iteration
    * count as [[qLabelProp]]); see [[graft.operators.Graph.modularity]]. */
  def qModularity(spark: SparkSession, dir: String): DataFrame = {
    // the edge list feeds BOTH the LPA run and the scoring pass —
    // checkpoint so lineitem scans once, not once per consumer
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().localCheckpoint()
    graft.operators.Graph.modularity(li,
      graft.operators.Graph.labelPropagation(li, iters = 3))
  }

  /** Personalized PageRank over the part↔supplier sourcing graph
    * (same node encoding and seed set as [[qShortestPath]]: every
    * 100th part) — "closeness to the audited parts" as a retrieval
    * score; see [[graft.operators.Graph.personalizedPageRank]]. */
  def qPpr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val e = li.unionAll(li.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val seeds = Tables(spark, dir).lineitem
      .filter(col("l_partkey") % 100 === 0)
      .select((col("l_partkey") * 2).as("node")).distinct()
    graft.operators.Graph.personalizedPageRank(e, seeds, iters = 3)
  }

  /** Adamic–Adar link prediction over the part↔supplier sourcing
    * graph restricted to every 20th part (same node encoding as
    * [[qPagerank]]): part–part pairs scored through shared-supplier
    * centers and supplier–supplier pairs through shared parts — the
    * "related items you don't yet co-source" candidate generator; see
    * [[graft.operators.Graph.adamicAdar]]. */
  def qAdamicAdar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .filter(col("l_partkey") % 20 === 0)
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    graft.operators.Graph.adamicAdar(li)
  }

  /** Jaccard link prediction over the same sourcing graph as
    * [[qAdamicAdar]] — the degree-normalized score; see
    * [[graft.operators.Graph.jaccardLinks]]. */
  def qJaccardLinks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .filter(col("l_partkey") % 20 === 0)
      .select((col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    graft.operators.Graph.jaccardLinks(li)
  }

  /** Exact triangle count of the co-purchase graph (parts sharing an
    * order), degree-oriented; see
    * [[graft.operators.Graph.triangleCount]]. */
  def qTriangles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.triangleCount(
      coPurchasePairs(Tables(spark, dir).lineitem))

  /** Multi-source BFS over the part↔supplier sourcing graph (same
    * node encoding as [[qPagerank]]): exact hop distance from the
    * nearest seed (part nodes ≡ 0 mod 200, i.e. every 100th part) —
    * the label-propagation-from-audited-seeds shape; see
    * [[graft.operators.Graph.shortestPaths]]. */
  def qShortestPath(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = li.select(col("p").as("src"), col("s").as("dst"))
      .union(li.select(col("s").as("src"), col("p").as("dst")))
    val seeds = edges.select(col("src").as("node")).distinct()
      .filter(col("node") % 200 === 0)
    graft.operators.Graph.shortestPaths(edges, seeds, maxHops = 3)
  }

  /** Deterministic DeepWalk corpus over the part↔supplier graph: 2
    * walks × 4 steps from every 25th part node, neighbor choice =
    * portable md5 hash of the walk coordinates mod out-degree (the
    * oracle replays whole walks); see
    * [[graft.operators.Graph.randomWalks]]. */
  def qRandomWalks(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
      .select((col("l_partkey") * 2).as("p"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = li.select(col("p").as("src"), col("s").as("dst"))
      .union(li.select(col("s").as("src"), col("p").as("dst")))
    val starts = edges.select(col("src").as("node")).distinct()
      .filter(col("node") % 50 === 0)
    graft.operators.Graph.randomWalks(edges, starts,
      walkLen = AdvancedAnalytics.randomWalkLen,
      walksPerNode = AdvancedAnalytics.randomWalksPerNode)
  }

  /** 2-core of the SUPPORT-2 co-purchase graph (part pairs bought
    * together in ≥ 2 distinct orders — the support floor sparsifies
    * the graph so peeling is nontrivial); see
    * [[graft.operators.Graph.kCore]]. */
  def qKCore(spark: SparkSession, dir: String): DataFrame = {
    // support = number of distinct orders sharing the pair (the
    // per-order pair stream is distinct-within-order by construction)
    val e = coPurchasePairs(Tables(spark, dir).lineitem)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 2)
      .select("src", "dst")
    graft.operators.Graph.kCore(e, k = 2)
  }

  /** Recursive-CTE hierarchy flatten over the 4-level
    * order→customer→nation→region dimension chain (ids offset into
    * disjoint ranges so one typed edge table holds all levels) — the
    * `WITH RECURSIVE` expansion DuckDB replays natively and Spark
    * runs as the BFS of [[graft.operators.Graph.ancestors]]. */
  def qHierarchyFlatten(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val edges = t.orders.select(
        (col("o_orderkey") + 1000000L).as("child"),
        col("o_custkey").as("parent"))
      .unionAll(t.customer.select(col("c_custkey").as("child"),
        (col("c_nationkey") + 100000L).as("parent")))
      .unionAll(t.nation.select((col("n_nationkey") + 100000L).as("child"),
        (col("n_regionkey") + 200000L).as("parent")))
    graft.operators.Graph.ancestors(edges, maxDepth = 8)
  }

  /** Multi-touch attribution: every purchase credits the clicks in
    * its trailing 7-day window under three models at once — linear
    * (equal split), first-touch, last-touch. Money moves in integer
    * micro-dollars with truncating division (the repo's exact-sum
    * contract: per-click credits are longs, so sums are
    * order-independent and the oracle replays them bit-for-bit).
    *
    * Scale shape: the click↔purchase pairing is an equi-join on
    * user_id with the time range as a residual; the rank/count
    * windows partition by purchase id — bounded by one user's clicks
    * in one 7-day window, never corpus-sized. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"),
        round(col("value") * 1e6).cast(LongType).as("value_micro"))
    val pairs = clicks.join(purchases, "user_id")
      .filter(col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 7 DAYS"))
    val wOrd = Window.partitionBy(col("purchase_id"))
      .orderBy(col("cts"), col("click_id"))
    val wAll = Window.partitionBy(col("purchase_id"))
    val credited = pairs
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("user_id"), col("click_id"),
        expr("value_micro div n").as("linear_micro"),
        when(col("rn") === 1, col("value_micro")).otherwise(lit(0L))
          .as("first_micro"),
        when(col("rn") === col("n"), col("value_micro")).otherwise(lit(0L))
          .as("last_micro"))
    credited.groupBy(col("user_id"), col("click_id"))
      .agg(sum(col("linear_micro")).as("linear_micro"),
        sum(col("first_micro")).as("first_micro"),
        sum(col("last_micro")).as("last_micro"))
  }
}
