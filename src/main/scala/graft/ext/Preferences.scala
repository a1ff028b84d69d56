package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise-preference aggregation — the RLHF/eval-data shape: given
  * (winner, loser) comparison rows (human A/B judgments, model-arena
  * outcomes, implicit click preferences), recover a per-item strength
  * on one scale via the Bradley–Terry model, P(i beats j) =
  * wᵢ/(wᵢ+wⱼ), fit by Hunter's MM iteration (Hunter, Annals of
  * Statistics 2004): wᵢ ← Wᵢ / Σⱼ (nᵢⱼ+nⱼᵢ)/(wᵢ+wⱼ), where Wᵢ is
  * item i's total win count. Unlike Elo the fit is ORDER-FREE (a
  * property of the likelihood, not the update sequence), which is
  * what makes it both the right model for batch preference data and
  * oracle-replayable.
  *
  * Determinism/scale contract (the repo's exact-sum discipline):
  * counts aggregate as longs; strengths live in integer micro-units;
  * each pair term is one fixed-shape IEEE double expression rounded
  * to an integer nano value BEFORE the per-item sum, so every
  * aggregation is an order-free long sum and any engine replays the
  * iterates bit-for-bit. Laplace (+1) smoothing on every ordered
  * pair of the item universe keeps all iterates strictly positive
  * (no divide-by-zero for never-winning items) — the MM update is
  * then exact on the smoothed counts.
  *
  * Scale shape: comparisons aggregate to one (winner, loser) keyed
  * count shuffle; everything after runs on the item-pair table
  * (items², item cardinality is vocabulary-bound — brands, models,
  * policies — never corpus-bound); each iteration is two keyed joins
  * + one partial-agg'd sum over that bounded table.
  */
object Preferences {

  /** Fit Bradley–Terry strengths from raw (winner, loser) rows.
    *
    * @param comparisons one row per observed comparison, columns
    *                    `winCol` / `loseCol` (same id domain)
    * @return (item, w_micro, rk): strength in micro-units after
    *         `iters` MM rounds, rank by (w_micro desc, item)
    */
  def bradleyTerry(comparisons: DataFrame, iters: Int = 3,
      winCol: String = "winner", loseCol: String = "loser"): DataFrame = {
    val raw = comparisons
      .select(col(winCol).cast(StringType).as("i"),
        col(loseCol).cast(StringType).as("j"))
      .filter(col("i").isNotNull && col("j").isNotNull && col("i") =!= col("j"))
    // one keyed count shuffle over the raw comparisons — the only
    // corpus-proportional stage; checkpointed (items²-bounded rows)
    // so the three consumers below (items twice via the cross join,
    // the smoothing join) don't re-scan the corpus each
    val wins = raw.groupBy("i", "j").agg(count(lit(1)).as("n_raw"))
      .coalesce(1).localCheckpoint()
    val items = wins.select(col("i").as("item"))
      .union(wins.select(col("j").as("item"))).distinct()
    // Laplace-smoothed counts over EVERY ordered pair of the item
    // universe (items² rows — bounded by construction); +1 keeps all
    // win totals positive so the MM iterates never hit 0/0
    val pairs = items.select(col("item").as("i"))
      .crossJoin(items.select(col("item").as("j")))
      .filter(col("i") =!= col("j"))
      .join(wins, Seq("i", "j"), "left")
      .select(col("i"), col("j"), (coalesce(col("n_raw"), lit(0L)) + 1L).as("n"))
      // items² rows by contract — one partition keeps every iteration
      // stage task-count-bounded instead of shuffle-width-wide
      .coalesce(1)
      .localCheckpoint() // reused every iteration — bounded items² rows
    graft.ext.Checkpoints.release(wins) // pairs materialized — wins is dead
    val winTotals = pairs.groupBy("i").agg(sum(col("n")).as("w_total"))
    // symmetric comparison counts m_ij = n_ij + n_ji, carried once
    val m = pairs.alias("a")
      .join(pairs.alias("b"),
        col("a.i") === col("b.j") && col("a.j") === col("b.i"))
      .select(col("a.i").as("i"), col("a.j").as("j"),
        (col("a.n") + col("b.n")).as("m"))
    // seeded from the checkpointed pairs (NOT items — wins' blocks are
    // already released and its lineage is truncated)
    var w = pairs.select(col("i").as("item")).distinct()
      .select(col("item"), lit(1000000L).as("w_micro"))
    for (_ <- 1 to iters) {
      val wi = w.select(col("item").as("i"), col("w_micro").as("wi"))
      val wj = w.select(col("item").as("j"), col("w_micro").as("wj"))
      // term_ij = m_ij / (w_i + w_j) in nano units, one fixed-shape
      // IEEE expression rounded to a long BEFORE the order-free sum:
      // m·1e15/(wi_micro+wj_micro) (the 1e6 unit change and the 1e9
      // nano scale folded into one exactly-representable constant)
      val denom = m.join(broadcast(wi), "i").join(broadcast(wj), "j")
        .select(col("i"),
          round(col("m").cast(DoubleType) * 1e15 /
            (col("wi") + col("wj")).cast(DoubleType), 0)
            .cast(LongType).as("t_nano"))
        .groupBy("i").agg(sum(col("t_nano")).as("denom_nano"))
      val prev = w
      // checkpoint each iterate (items rows — tiny): the two broadcast
      // sides above would otherwise each re-execute the whole prior
      // chain, doubling work per round (the Graph round discipline)
      w = denom.join(broadcast(winTotals), "i")
        .select(col("i").as("item"),
          round(col("w_total").cast(DoubleType) * 1e15 /
            col("denom_nano").cast(DoubleType), 0)
            .cast(LongType).as("w_micro"))
        .localCheckpoint()
      graft.ext.Checkpoints.release(prev)
    }
    // the rank window runs over the item-cardinality table only
    // (bounded by contract — never corpus rows); the result is
    // materialized so the items² scaffold can be released here
    // rather than leaking until the caller's releaseAll
    val out = w.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("w_micro").desc, col("item"))).cast(IntegerType))
      .localCheckpoint()
    graft.ext.Checkpoints.release(pairs)
    out
  }
}
