package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classifier/annotation QA statistics — the evaluation loop around a
  * model-scored corpus: a quality/language/toxicity classifier whose
  * scores gate 100 TB of data needs its probabilities CALIBRATED
  * (does p=0.9 mean 90%?), and human/LLM labeling pipelines need
  * chance-corrected AGREEMENT, not raw percent-match.
  *
  * Exactness contract (the repo's exact-sum discipline): inputs are
  * integer micro probabilities and discrete labels; every aggregation
  * is an order-free long sum; each output statistic is a single
  * fixed-shape IEEE division of exact longs, rounded to 6dp — any
  * engine replays it bit-for-bit.
  */
object Evaluation {

  /** Reliability diagram + summary calibration metrics for binary
    * predictions: rows bucket by predicted probability into `bins`
    * equal-width bins (integer arithmetic — bin boundaries cannot
    * drift between engines); per bin, mean confidence vs empirical
    * accuracy and their gap; every row also carries the expected /
    * maximum calibration error (ECE/MCE, Naeini et al. 2015) and the
    * Brier score so the result is one self-contained table.
    *
    * Scale shape: one bins-keyed shuffle (map-side combined) over the
    * prediction stream, then a bins-sized rollup — nothing
    * corpus-proportional after the first aggregate. Per-row Brier
    * terms are micro-rounded longs ((pᵢ−yᵢ)² div 1e-6 scale), so the
    * global sum is order-free and overflow-safe to ~10¹² rows.
    *
    * @param preds rows with `pCol` (long micro-probability in
    *              [0, 1e6]) and `yCol` (0/1 long label)
    * @return one row per non-empty bin: (bin, n_bin, conf_micro,
    *         acc_micro, gap_micro, ece_micro, mce_micro, brier_micro)
    */
  def calibration(preds: DataFrame, bins: Int = 10,
      pCol: String = "p_micro", yCol: String = "y"): DataFrame =
    calibrationFinish(calibrationState(preds, bins, pCol, yCol))

  /** The binned per-row terms (bin, p, y, sq_micro) — stateless, so
    * it runs unchanged on an unbounded stream. */
  private[graft] def calibrationTerms(preds: DataFrame, bins: Int,
      pCol: String = "p_micro", yCol: String = "y"): DataFrame = {
    val p = col(pCol).cast(LongType)
    val y = col(yCol).cast(LongType)
    preds.select(
      // explicit floor(…) in BOTH engines: long/long division is
      // fractional in both, and a bare double→int cast truncates in
      // Spark but rounds in DuckDB — floor makes the value integer
      // before any cast (exact: quotient granularity 1e-6 ≫ double
      // ulp at these magnitudes, so floor lands identically)
      least(floor(p * bins.toLong / 1000000L), lit(bins.toLong - 1))
        .cast(LongType).as("bin"),
      p.as("p"), y.as("y"),
      // per-row Brier term in micro units: floor(d²/1e6), d = p−y·1e6
      floor((p - y * 1000000L) * (p - y * 1000000L) / 1000000L)
        .cast(LongType).as("sq_micro"))
  }

  /** The ALGEBRAIC per-bin accumulator (n, Σp, positives, Σsq) — four
    * commutative long sums, so shards/micro-batches merge freely and
    * the state is bins rows forever (the streaming-twin state table,
    * [[graft.streaming.StreamingOps.calibrationStateStream]]). */
  private[graft] def calibrationState(preds: DataFrame, bins: Int,
      pCol: String = "p_micro", yCol: String = "y"): DataFrame =
    calibrationTerms(preds, bins, pCol, yCol).groupBy("bin")
      .agg(count(lit(1)).as("n_bin"), sum(col("p")).as("sum_p"),
        sum(col("y")).as("pos"), sum(col("sq_micro")).as("sq"))

  /** Finish a state snapshot into the reliability table + ECE/MCE/
    * Brier summary — bins-sized input, identical result whether the
    * state came from one batch pass or merged micro-batches. */
  def calibrationFinish(state: DataFrame): DataFrame = {
    val perBin = state
      .select(col("bin"), col("n_bin"),
        round(col("sum_p").cast(DoubleType) / col("n_bin").cast(DoubleType), 0)
          .cast(LongType).as("conf_micro"),
        round(col("pos").cast(DoubleType) * 1e6 / col("n_bin").cast(DoubleType), 0)
          .cast(LongType).as("acc_micro"),
        col("sq"))
      .withColumn("gap_micro", abs(col("acc_micro") - col("conf_micro")))
    // bins-sized rollup: ECE = Σ gap·n / N, MCE = max gap,
    // Brier = Σ sq / N — exact-long numerators, one division each
    val summary = perBin.agg(
        sum(col("gap_micro") * col("n_bin")).as("gap_w"),
        max(col("gap_micro")).as("mce_micro"),
        sum(col("sq")).as("sq_all"), sum(col("n_bin")).as("n"))
      .select(
        round(col("gap_w").cast(DoubleType) / col("n").cast(DoubleType), 0)
          .cast(LongType).as("ece_micro"),
        col("mce_micro"),
        round(col("sq_all").cast(DoubleType) / col("n").cast(DoubleType), 0)
          .cast(LongType).as("brier_micro"))
    perBin.select(col("bin"), col("n_bin"), col("conf_micro"),
        col("acc_micro"), col("gap_micro"))
      .crossJoin(broadcast(summary))
  }

  /** Cohen's κ chance-corrected agreement between two annotators'
    * labels, per group (a labeling pipeline reports agreement per
    * source/task, not one global number): κ = (pₒ − pₑ)/(1 − pₑ)
    * with pₒ the observed agreement rate and pₑ = Σ_c pₐ(c)·p_b(c)
    * the chance rate from each annotator's marginals. Multi-class.
    * Degenerate groups where pₑ = 1 (both annotators constant and
    * equal) score κ = 0 by convention.
    *
    * Scale shape: one (group, label-pair) count shuffle; marginal
    * products live on the group×labels table (vocabulary-bound).
    * pₑ's numerator Σ nₐ(c)·n_b(c) is an exact long (< 2⁵³ through
    * ~9·10⁷ rows per group — the documented engine-parity bound for
    * the final double cast).
    *
    * @param labels rows with `groupCol`, `aCol`, `bCol`
    * @return (grp, n, agree, po, pe, kappa) — po/pe/kappa 6dp */
  def cohenKappa(labels: DataFrame, groupCol: String = "group",
      aCol: String = "label_a", bCol: String = "label_b"): DataFrame = {
    val g = col(groupCol).as("grp")
    val cells = labels.select(g, col(aCol).as("la"), col(bCol).as("lb"))
      .groupBy("grp", "la", "lb").agg(count(lit(1)).as("c"))
      .localCheckpoint() // groups×labels²-bounded; read 3× below
    val n = cells.groupBy("grp").agg(sum(col("c")).as("n"))
    val agree = cells.filter(col("la") === col("lb"))
      .groupBy("grp").agg(sum(col("c")).as("agree"))
    val ma = cells.groupBy("grp", "la").agg(sum(col("c")).as("na"))
    val mb = cells.groupBy("grp", "lb").agg(sum(col("c")).as("nb"))
    val peNum = ma.join(mb,
        ma("grp") === mb("grp") && ma("la") === mb("lb"))
      .groupBy(ma("grp").as("grp")).agg(sum(col("na") * col("nb")).as("pe_num"))
    val po = col("agree").cast(DoubleType) / col("n").cast(DoubleType)
    val pe = col("pe_num").cast(DoubleType) /
      (col("n") * col("n")).cast(DoubleType)
    val out = n.join(agree, Seq("grp"), "left").join(peNum, Seq("grp"), "left")
      .select(col("grp"), col("n"),
        coalesce(col("agree"), lit(0L)).as("agree"),
        coalesce(col("pe_num"), lit(0L)).as("pe_num"))
      .select(col("grp"), col("n"), col("agree"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round(when(pe === 1.0, 0.0).otherwise((po - pe) / (lit(1.0) - pe)), 6)
          .as("kappa"))
      // groups-sized result materialized so the cells scaffold can be
      // released here instead of leaking until the caller's releaseAll
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells)
    out
  }
}
