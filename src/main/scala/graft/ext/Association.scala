package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining (Agrawal & Srikant's Apriori
  * measures at the pair level): which items co-occur in the same
  * basket more than chance predicts. support(a,b) = co-occurrence
  * count, confidence(a→b) = s(a,b)/s(a), lift = confidence / P(b) —
  * lift > 1 means genuinely associated, not just popular.
  *
  * Portability: confidence and lift are defined as exact truncating
  * integer micro divisions — conf = s_ab·10⁶ div s_a, lift =
  * s_ab·N·10⁶ div (s_a·s_b) — no doubles anywhere, so the rule table
  * replays bit-identically.
  *
  * Scale shape: the basket table collapses to distinct (basket, item)
  * once; the pair explode is bounded by basket size² per basket
  * (the same cost Apriori pays), aggregated with map-side combine
  * into the pair-support table; item supports are item-cardinality-
  * sized and join keyed; the basket total is one scalar; selection
  * is TakeOrdered top-k. The minSupport floor prunes the pair table
  * before the support joins, which is what keeps the rule stage
  * item²-bounded instead of basket-bounded at 100 TB.
  */
object Association {

  /** Pair association rules from a (basketCol, itemCol) table.
    *
    * @param minSupport drop pairs co-occurring in fewer baskets.
    * @return top-k (a, b, s_ab, conf_micro, lift_micro) by lift —
    *         both rule directions (conf differs, lift is symmetric).
    */
  def pairRules(df: DataFrame, basketCol: String = "ok",
      itemCol: String = "pk", minSupport: Long = 3,
      topK: Int = 50): DataFrame = {
    // r18: one per-basket grouping replaces the distinct + self-join
    // on the basket key (which shuffled and sorted the item table
    // twice); pairs are generated map-side from the sorted distinct
    // basket array. Only ORDERED pairs (a < b) flow through the
    // pair-support shuffle — half the bytes (guide: shuffle fewer
    // bytes) — and both rule directions are mirrored from the
    // aggregated table (s_ab is symmetric).
    val baskets = df.select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("items"))
      .localCheckpoint() // feeds supports, pairs, and the basket total
    val nOrders = baskets.count()
    val supp = baskets.select(explode(col("items")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("s"))
    val pairsOrd = baskets
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items) - i - 1), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .filter(col("s_ab") >= minSupport)
    val pairs = pairsOrd.unionAll(pairsOrd.select(
      col("b").as("a"), col("a").as("b"), col("s_ab")))
    pairs
      .join(supp.select(col("pk").as("a"), col("s").as("s_a")), Seq("a"))
      .join(supp.select(col("pk").as("b"), col("s").as("s_b")), Seq("b"))
      .select(col("a"), col("b"), col("s_ab"),
        expr("(s_ab * 1000000) div s_a").as("conf_micro"),
        expr(s"(s_ab * ${nOrders}L * 1000000) div (s_a * s_b)")
          .as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("a"), col("b"))
      .limit(topK)
  }
}
