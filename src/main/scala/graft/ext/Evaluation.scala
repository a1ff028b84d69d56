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

  /** ROC-AUC per group from the Mann–Whitney rank-sum identity with
    * exact mid-rank tie handling: AUC = U/(P·N) where
    * U = Σ_s pos(s)·(neg_below(s) + neg(s)/2) over distinct scores s.
    * The halves are avoided by carrying 2U as an exact long
    * (u2 = Σ pos·(2·neg_below + neg)), so the only IEEE step is the
    * final u2/(2·P·N) division — any engine replays it bit-for-bit.
    * Groups with no positives or no negatives score 0.5 by the
    * coin-flip convention (AUC is undefined there).
    *
    * Scale shape: one (group, score) count shuffle over the
    * prediction stream (map-side combined), after which EVERYTHING is
    * score-cardinality-bounded — the cumulative window partitions by
    * group over the distinct-score table, ≤ 1e6+1 rows per group for
    * micro-probability scores, never corpus-proportional (the same
    * bounded-window argument as [[calibration]]'s bins). u2 stays
    * long-exact through ~3·10⁹ rows per group (pos·neg < 2⁶³).
    *
    * @param preds rows with `groupCol`, `scoreCol` (long micro score)
    *              and `yCol` (0/1 long label)
    * @return (grp, n_pos, n_neg, u2, auc) — auc 6dp */
  def aucRoc(preds: DataFrame, groupCol: String = "group",
      scoreCol: String = "score_micro", yCol: String = "y"): DataFrame =
    aucRocFinish(aucRocState(preds, groupCol, scoreCol, yCol))

  /** The ALGEBRAIC (grp, score) accumulator (pos, neg) — two
    * commutative long sums keyed by group × distinct score, so
    * shards/micro-batches merge freely and the state is
    * score-cardinality-bounded forever (the streaming-twin state
    * table, [[graft.streaming.StreamingOps.aucStateStream]]). */
  private[graft] def aucRocState(preds: DataFrame,
      groupCol: String = "group", scoreCol: String = "score_micro",
      yCol: String = "y"): DataFrame =
    preds
      .select(col(groupCol).as("grp"), col(scoreCol).cast(LongType).as("s"),
        col(yCol).cast(LongType).as("y"))
      .groupBy("grp", "s")
      .agg(sum(col("y")).cast(LongType).as("pos"),
        (count(lit(1)) - sum(col("y"))).cast(LongType).as("neg"))

  /** Finish a state snapshot into (grp, n_pos, n_neg, u2, auc) —
    * state-sized input, identical whether the cells came from one
    * batch pass or merged micro-batches. */
  def aucRocFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // score-cardinality-bounded window (distinct scores per group)
    val wBelow = Window.partitionBy("grp").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = state.withColumn("negBelow",
      coalesce(sum(col("neg")).over(wBelow), lit(0L)))
    val agg = terms.groupBy("grp").agg(
      sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
      sum(col("pos") * (lit(2L) * col("negBelow") + col("neg"))).as("u2"))
    agg.select(col("grp"), col("n_pos"), col("n_neg"), col("u2"),
      round(when(col("n_pos") === 0L || col("n_neg") === 0L, 0.5)
        .otherwise(col("u2").cast(DoubleType) /
          (lit(2.0) * col("n_pos").cast(DoubleType) *
            col("n_neg").cast(DoubleType))), 6).as("auc"))
  }

  /** Fleiss' κ multi-rater chance-corrected agreement per group
    * (generalized to variable raters-per-item, the real shape of a
    * crowd/LLM labeling pipeline): with n_ic the count of raters
    * putting item i in category c, n_i = Σ_c n_ic,
    * P̄ₒ = Σ_i Σ_c n_ic(n_ic−1) / Σ_i n_i(n_i−1) and
    * P̄ₑ = Σ_c (Σ_i n_ic)² / (Σ_i n_i)². Items with a single rating
    * carry no agreement signal and are excluded from BOTH numerators
    * and marginals. Degenerate groups with P̄ₑ = 1 score κ = 0.
    *
    * Exactness: every numerator/denominator is an order-free long sum
    * (pe's Σ m_c² is exact while total ratings per group < 3·10⁹);
    * po/pe/κ are single fixed-shape IEEE divisions, 6dp.
    *
    * Scale shape: one (group, item, category) count shuffle, a
    * per-item rollup keyed on (group, item), then group-sized and
    * (group × categories)-sized aggregates — nothing after the first
    * two map-side-combined shuffles is corpus-proportional.
    *
    * @param ratings one row per individual rating: `groupCol`,
    *                `itemCol`, `catCol`
    * @return (grp, n_items, n_ratings, po, pe, kappa) — 6dp */
  def fleissKappa(ratings: DataFrame, groupCol: String = "group",
      itemCol: String = "item", catCol: String = "cat"): DataFrame = {
    val nic = ratings
      .select(col(groupCol).as("grp"), col(itemCol).as("item"),
        col(catCol).as("cat"))
      .groupBy("grp", "item", "cat").agg(count(lit(1)).as("c"))
    val perItem = nic.groupBy("grp", "item")
      .agg(sum(col("c")).as("ni"),
        sum(col("c") * (col("c") - 1L)).as("po_i"),
        // category marginals must also drop single-rating items, so
        // the per-category sums re-aggregate from this keyed rollup
        collect_list(struct(col("cat"), col("c"))).as("cats"))
      .filter(col("ni") >= 2L)
      .localCheckpoint() // items-bounded; read twice below
    val po = perItem.groupBy("grp").agg(
      count(lit(1)).as("n_items"), sum(col("ni")).as("n_ratings"),
      sum(col("po_i")).as("po_num"),
      sum(col("ni") * (col("ni") - 1L)).as("po_den"))
    val marg = perItem
      .select(col("grp"), explode(col("cats")).as("kc"))
      .groupBy(col("grp"), col("kc.cat"))
      .agg(sum(col("kc.c")).as("mc"))
      .groupBy("grp").agg(sum(col("mc") * col("mc")).as("pe_num"))
    val poD = col("po_num").cast(DoubleType) / col("po_den").cast(DoubleType)
    val peD = col("pe_num").cast(DoubleType) /
      (col("n_ratings") * col("n_ratings")).cast(DoubleType)
    val out = po.join(marg, Seq("grp"), "left")
      .select(col("grp"), col("n_items"), col("n_ratings"),
        round(poD, 6).as("po"), round(peD, 6).as("pe"),
        round(when(peD === 1.0, 0.0)
          .otherwise((poD - peD) / (lit(1.0) - peD)), 6).as("kappa"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(perItem)
    out
  }

  /** Krippendorff's α (nominal metric) over multi-rater ratings WITH
    * MISSING DATA — the agreement coefficient the other two cannot
    * express: Cohen's κ needs exactly two complete raters, Fleiss' κ
    * assumes every rater rates every item; α takes any number of
    * raters each rating any subset, which is what real annotation
    * campaigns produce. Coincidence-matrix formulation (Krippendorff
    * 2004): observed disagreement Do = Σ_u (m_u² − Σ_c c_uc²)/(m_u−1),
    * expected De = (n² − Σ_c n_c²)/(n−1), α = 1 − Do/De.
    *
    * Exactness: the per-unit 1/(m_u−1) weights CANCEL in the category
    * marginals, so n_c and n are exact longs; each unit's Do term is
    * micro-rounded and summed as longs (order-free — the
    * hits/pagerank fixed-point discipline); De is one IEEE division
    * of exact longs. Items with <2 ratings drop (no pairable
    * information — standard α). A group with no category variation
    * (De = 0) reports α = 1 by convention (nothing to disagree
    * about), flagged by de = 0 in the output.
    *
    * Scale shape: one (grp, item, cat) count shuffle, an items-keyed
    * rollup, and a categories-bounded marginal — nothing
    * rater-quadratic anywhere.
    *
    * @param ratings one row per rating: `groupCol`, `itemCol`, `catCol`
    * @return (grp, n_items, n_ratings, do_micro, de, alpha) */
  def krippendorffAlpha(ratings: DataFrame, groupCol: String = "group",
      itemCol: String = "item", catCol: String = "cat"): DataFrame = {
    val nic = ratings
      .select(col(groupCol).as("grp"), col(itemCol).as("item"),
        col(catCol).as("cat"))
      .groupBy("grp", "item", "cat").agg(count(lit(1)).as("c"))
      .localCheckpoint() // read twice: unit rollup + marginals
    val perItem = nic.groupBy("grp", "item")
      .agg(sum(col("c")).as("m"), sum(col("c") * col("c")).as("sumc2"))
      .filter(col("m") >= 2L)
      .withColumn("du_micro",
        round(lit(1e6) * (col("m") * col("m") - col("sumc2")).cast(DoubleType)
          / (col("m") - 1L).cast(DoubleType), 0).cast(LongType))
      .localCheckpoint() // read twice: Do sum + marginal semi-join
    val doAgg = perItem.groupBy("grp").agg(
      count(lit(1)).as("n_items"), sum(col("m")).as("n_ratings"),
      sum(col("du_micro")).as("do_micro"))
    val marg = nic
      .join(perItem.select("grp", "item"), Seq("grp", "item"), "left_semi")
      .groupBy("grp", "cat").agg(sum(col("c")).as("nc"))
      .groupBy("grp").agg(sum(col("nc") * col("nc")).as("sum_nc2"))
    val deNum = col("n_ratings") * col("n_ratings") - col("sum_nc2")
    val deD = deNum.cast(DoubleType) / (col("n_ratings") - 1L).cast(DoubleType)
    val out = doAgg.join(marg, Seq("grp"))
      .select(col("grp"), col("n_items"), col("n_ratings"), col("do_micro"),
        round(deD, 6).as("de"),
        when(deNum === 0L, lit(1.0))
          .otherwise(round(lit(1.0) -
            (col("do_micro").cast(DoubleType) / 1e6) / deD, 6)).as("alpha"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(nic, perItem)
    out
  }

  /** Krippendorff's α with the INTERVAL metric — the ordinal/numeric
    * companion to the nominal [[krippendorffAlpha]]: disagreement
    * between two ratings is (v−k)², so a 1-vs-5 judge split costs
    * 16× a 1-vs-2 split (nominal α scores both as one disagreement —
    * wrong for Likert/LLM-judge scales). Same incomplete-panel
    * semantics: single-rating units are excluded everywhere.
    *
    * The category grid disappears algebraically:
    * Σ_{c,k} n_c·n_k·(c−k)² = 2(m·Σv² − (Σv)²), so each unit's
    * observed-disagreement term needs only its rating count, sum, and
    * sum of squares — and the expected term needs only the same three
    * totals over all qualifying units. Exactness contract: ratings
    * are integer longs; every sum is an exact long; each unit
    * contributes one micro-rounded division by (m−1) (the nominal
    * discipline), and De is one double division of exact longs.
    *
    * Scale shape: ONE (group, item) rollup with map-side combine,
    * then a groups-sized finish — no category dimension at all, so
    * the value vocabulary can be unbounded (real-valued scores work
    * once scaled to integers).
    *
    * @param ratings one row per rating: `groupCol`, `itemCol`,
    *   integer `valCol`
    * @return (grp, n_items, n_ratings, do_micro, de, alpha) */
  def krippendorffAlphaInterval(ratings: DataFrame,
      groupCol: String = "group", itemCol: String = "item",
      valCol: String = "v"): DataFrame = {
    val perItem = ratings
      .select(col(groupCol).as("grp"), col(itemCol).as("item"),
        col(valCol).cast(LongType).as("v"))
      .groupBy("grp", "item")
      .agg(count(lit(1)).as("m"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .filter(col("m") >= 2L)
      .withColumn("du_micro",
        round(lit(1e6) *
            (lit(2L) * (col("m") * col("s2") - col("s1") * col("s1")))
              .cast(DoubleType) /
            (col("m") - 1L).cast(DoubleType), 0)
          .cast(LongType))
    val agg = perItem.groupBy("grp").agg(
      count(lit(1)).as("n_items"), sum(col("m")).as("n_ratings"),
      sum(col("du_micro")).as("do_micro"),
      sum(col("s1")).as("t1"), sum(col("s2")).as("t2"))
    val deNum = lit(2L) * (col("n_ratings") * col("t2") - col("t1") * col("t1"))
    val deD = deNum.cast(DoubleType) / (col("n_ratings") - 1L).cast(DoubleType)
    agg.select(col("grp"), col("n_items"), col("n_ratings"), col("do_micro"),
      round(deD, 6).as("de"),
      when(deNum === 0L, lit(1.0))
        .otherwise(round(lit(1.0) -
          (col("do_micro").cast(DoubleType) / 1e6) / deD, 6)).as("alpha"))
  }

  /** Majority-vote label aggregation over multi-rater ratings — the
    * weak-supervision baseline (Snorkel's majority model) that turns
    * N noisy annotator calls per item into one training label with a
    * confidence: winner = most-voted category, ties broken by
    * lexicographically smallest category (deterministic — a replay
    * yields the same corpus) and flagged `is_tie` so callers can drop
    * or down-weight them.
    *
    * Exactness: counts are exact longs; confidence is one division,
    * 6dp. Scale shape: one (group, item, cat) count shuffle, then a
    * per-item rollup whose collect_list is CATEGORIES-bounded (the
    * label vocabulary, never the rater count — votes pre-aggregate).
    *
    * @param ratings one row per rating: `groupCol`, `itemCol`, `catCol`
    * @return (grp, item, label, votes, n_ratings, confidence, is_tie) */
  def labelVote(ratings: DataFrame, groupCol: String = "group",
      itemCol: String = "item", catCol: String = "cat"): DataFrame = {
    val cells = ratings
      .select(col(groupCol).as("grp"), col(itemCol).as("item"),
        col(catCol).as("cat"))
      .groupBy("grp", "item", "cat").agg(count(lit(1)).as("c"))
    cells.groupBy("grp", "item")
      .agg(sum(col("c")).as("n_ratings"),
        sort_array(collect_list(struct((-col("c")).as("nc"), col("cat"))))
          .as("ranked"))
      .select(col("grp"), col("item"),
        expr("ranked[0].cat").as("label"),
        (-expr("ranked[0].nc")).cast(LongType).as("votes"),
        col("n_ratings"),
        round((-expr("ranked[0].nc")).cast(DoubleType) /
          col("n_ratings").cast(DoubleType), 6).as("confidence"),
        (size(col("ranked")) > 1 &&
          expr("ranked[1].nc = ranked[0].nc")).as("is_tie"))
  }

  /** Pearson χ² test of independence between two categorical columns
    * per group, with Cramér's V effect size — the "is my quality
    * label independent of the source/language?" audit every
    * classifier-gated corpus needs (a high V means the gate is really
    * a proxy for the other column): χ² = Σ_cells (o−e)²/e over the
    * FULL marginal grid (zero-observed cells contribute e), with
    * e_ij = r_i·c_j/N, and V = √(χ²/(N·min(k_a−1, k_b−1))).
    *
    * Exactness: observed/marginal counts are exact longs; each cell's
    * (o·N − r_i·c_j) difference is long-exact (documented bound
    * N < 3·10⁹ rows per group), squared and divided in one
    * fixed-shape double expression per cell, micro-rounded BEFORE the
    * order-free sum. V's sqrt is IEEE-exact. Degenerate tables
    * (either column constant ⇒ dof 0) score χ² = 0, V = 0.
    *
    * Scale shape: one (group, la, lb) count shuffle, then everything
    * lives on vocabulary-bounded marginal tables (the [[cohenKappa]]
    * budget — the grid is |A|×|B| per group, built from the marginals,
    * never from the corpus).
    *
    * @param labels rows with `groupCol`, `aCol`, `bCol`
    * @return (grp, n, dof, chi2_micro, cramers_v) — V 6dp */
  def chiSquare(labels: DataFrame, groupCol: String = "group",
      aCol: String = "label_a", bCol: String = "label_b"): DataFrame =
    chiSquareFinish(chiSquareState(labels, groupCol, aCol, bCol))

  /** The ALGEBRAIC (grp, la, lb) contingency accumulator — one
    * commutative long count per cell, vocabulary²-bounded state (the
    * streaming-twin state table,
    * [[graft.streaming.StreamingOps.chiSquareStateStream]]). */
  private[graft] def chiSquareState(labels: DataFrame,
      groupCol: String = "group", aCol: String = "label_a",
      bCol: String = "label_b"): DataFrame =
    labels
      .select(col(groupCol).as("grp"), col(aCol).as("la"), col(bCol).as("lb"))
      .groupBy("grp", "la", "lb").agg(count(lit(1)).as("o"))

  /** Finish a contingency snapshot into the χ²/V table — state-sized
    * input, identical whether cells came from one batch pass or
    * merged micro-batches. */
  def chiSquareFinish(state: DataFrame): DataFrame = {
    val cells = state
      .select(col("grp"), col("la"), col("lb"), col("o").cast(LongType).as("o"))
      .localCheckpoint() // groups×labels²-bounded; read 3× below
    val ma = cells.groupBy("grp", "la").agg(sum(col("o")).as("rn"))
    val mb = cells.groupBy("grp", "lb").agg(sum(col("o")).as("cn"))
    val n = cells.groupBy("grp").agg(sum(col("o")).as("n"))
    // full grid from the marginals (includes zero-observed cells)
    val grid = ma.join(mb, Seq("grp"))
      .join(n, Seq("grp"))
      .join(cells, Seq("grp", "la", "lb"), "left")
      .select(col("grp"), col("n"), col("rn"), col("cn"),
        coalesce(col("o"), lit(0L)).as("o"))
    // (o·N − r·c)²/(N·r·c): long-exact difference, fixed-shape double
    val d = (col("o") * col("n") - col("rn") * col("cn")).cast(DoubleType)
    val den = col("n").cast(DoubleType) * col("rn").cast(DoubleType) *
      col("cn").cast(DoubleType)
    val terms = grid.select(col("grp"), col("n"),
      round(d * d / den * 1e6, 0).cast(LongType).as("term_micro"))
    val chi = terms.groupBy("grp")
      .agg(max(col("n")).as("n"), sum(col("term_micro")).as("chi2_micro"))
    val ks = ma.groupBy("grp").agg(countDistinct(col("la")).as("ka"))
      .join(mb.groupBy("grp").agg(countDistinct(col("lb")).as("kb")),
        Seq("grp"))
    val minSide = least(col("ka") - 1L, col("kb") - 1L)
    val out = chi.join(ks, Seq("grp"))
      .select(col("grp"), col("n"),
        ((col("ka") - 1L) * (col("kb") - 1L)).as("dof"),
        when(minSide === 0L, 0L).otherwise(col("chi2_micro"))
          .as("chi2_micro"),
        round(when(minSide === 0L, 0.0).otherwise(
          sqrt(col("chi2_micro").cast(DoubleType) / 1e6 /
            (col("n").cast(DoubleType) * minSide.cast(DoubleType)))), 6)
          .as("cramers_v"))
      .localCheckpoint() // groups-sized; release the cells scaffold
    graft.ext.Checkpoints.release(cells)
    out
  }

  /** Two-sample Kolmogorov–Smirnov distance per group — the
    * distribution-drift test between two corpora's score columns
    * (yesterday's crawl vs today's, train vs eval):
    * D = max_x |F_a(x) − F_b(x)| over the pooled support. The max is
    * carried as the exact long d_num = max |cumA·n_b − cumB·n_a|, so
    * the only IEEE step is the final d_num/(n_a·n_b) division.
    * Groups empty on either side return D = 1 (maximal drift) — a
    * missing side IS maximal distribution change.
    *
    * Scale shape: one (group, value) count shuffle per side (map-side
    * combined), then a cumulative window over the pooled
    * distinct-value table — value-cardinality-bounded per group
    * (≤ 1e6+1 for micro scores), never corpus-proportional. Exact
    * while n_a·n_b < 2⁶³ (~3·10⁹ rows per side per group).
    *
    * @param a,b rows with `groupCol` and `valueCol` (long-castable)
    * @return (grp, n_a, n_b, d_num, ks) — ks 6dp */
  def ksTest(a: DataFrame, b: DataFrame, groupCol: String = "group",
      valueCol: String = "v"): DataFrame = {
    val tagged = a
      .select(col(groupCol).as("grp"), col(valueCol).cast(LongType).as("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col(groupCol).as("grp"),
        col(valueCol).cast(LongType).as("v"), lit(1L).as("side")))
    ksFinish(ksState(tagged))
  }

  /** The ALGEBRAIC (grp, value) accumulator (ca, cb) over side-tagged
    * rows (side 0 = sample A, 1 = sample B) — two commutative long
    * sums, value-cardinality-bounded state (the streaming-twin state
    * table, [[graft.streaming.StreamingOps.ksStateStream]]). */
  private[graft] def ksState(tagged: DataFrame, groupCol: String = "grp",
      valueCol: String = "v", sideCol: String = "side"): DataFrame =
    tagged
      .select(col(groupCol).as("grp"), col(valueCol).cast(LongType).as("v"),
        col(sideCol).cast(LongType).as("side"))
      .groupBy("grp", "v")
      .agg(sum(lit(1L) - col("side")).as("ca"), sum(col("side")).as("cb"))

  /** Population Stability Index per group between a baseline and a
    * current sample of a micro score — THE model-monitoring drift
    * gate (industry convention: < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 retrain): scores bucket into `bins` equal-width bins
    * (the [[calibration]] integer binning, so boundaries cannot drift
    * between engines), and PSI = Σ_bins (p_b − p_a)·ln(p_b/p_a) with
    * +1 Laplace smoothing so empty bins stay finite.
    *
    * Exactness: per-bin counts are exact longs; each bin's term is
    * micro-rounded to a long BEFORE summing (order-free — the
    * [[graft.ext.Curation.corpusDrift]] discipline), with the ln
    * ratio computed from one exact-long cross product.
    *
    * Scale shape: one (group, bin) count shuffle (map-side combined),
    * then bins-sized arithmetic — nothing corpus-proportional after
    * the first aggregate. The state is algebraic (two long sums per
    * cell), so micro-batches fold freely
    * ([[graft.streaming.StreamingOps.psiStateStream]]).
    *
    * @param a baseline rows, @param b current rows — both with
    *          `groupCol` and `pCol` (long micro score in [0, 1e6])
    * @return one row per (grp, bin): (grp, bin, a_n, b_n,
    *         term_micro, psi_micro) — psi_micro repeated per group */
  def psi(a: DataFrame, b: DataFrame, bins: Int = 10,
      groupCol: String = "group", pCol: String = "p_micro"): DataFrame = {
    val tagged = a
      .select(col(groupCol).as("grp"), col(pCol).cast(LongType).as("p"),
        lit(0L).as("side"))
      .unionAll(b.select(col(groupCol).as("grp"),
        col(pCol).cast(LongType).as("p"), lit(1L).as("side")))
    psiFinish(psiState(tagged, bins), bins)
  }

  /** The ALGEBRAIC (grp, bin) accumulator (a_n, b_n) over side-tagged
    * rows — group × bins-bounded state, commutative long sums. */
  private[graft] def psiState(tagged: DataFrame, bins: Int,
      groupCol: String = "grp", pCol: String = "p",
      sideCol: String = "side"): DataFrame = {
    val p = col(pCol).cast(LongType)
    tagged
      .select(col(groupCol).as("grp"),
        // the calibration binning: integer floor, top score clamped
        least(floor(p * bins.toLong / 1000000L), lit(bins.toLong - 1))
          .cast(LongType).as("bin"),
        col(sideCol).cast(LongType).as("side"))
      .groupBy("grp", "bin")
      .agg(sum(lit(1L) - col("side")).as("a_n"), sum(col("side")).as("b_n"))
  }

  /** Finish a state snapshot into the per-bin PSI table — bins-sized
    * input; missing bins enter as zero counts (smoothed). */
  def psiFinish(state: DataFrame, bins: Int): DataFrame = {
    val totals = state.groupBy("grp")
      .agg(sum(col("a_n")).as("ta"), sum(col("b_n")).as("tb"))
    // probe side renamed: totals derives from the same relation, and
    // the grid join would otherwise self-join conflicting references
    // (streaming memory-table state hits the resolver exactly there)
    val cells = state.select(col("grp").as("cg"), col("bin").as("cbin"),
      col("a_n").as("ca_n"), col("b_n").as("cb_n"))
    // full grid: every (grp, bin) cell, including empty bins
    val grid = totals
      .select(col("grp"), col("ta"), col("tb"),
        explode(sequence(lit(0L), lit(bins.toLong - 1))).as("bin"))
      .join(cells,
        col("grp") === col("cg") && col("bin") === col("cbin"), "left")
      .select(col("grp"), col("bin"), col("ta"), col("tb"),
        coalesce(col("ca_n"), lit(0L)).as("a_n"),
        coalesce(col("cb_n"), lit(0L)).as("b_n"))
    val bl = lit(bins.toLong)
    val pa = (col("a_n") + 1L).cast(DoubleType) / (col("ta") + bl).cast(DoubleType)
    val pb = (col("b_n") + 1L).cast(DoubleType) / (col("tb") + bl).cast(DoubleType)
    // ln of ONE exact-long cross ratio; term micro-rounded pre-sum
    val lnRatio = log(((col("b_n") + 1L) * (col("ta") + bl)).cast(DoubleType) /
      ((col("a_n") + 1L) * (col("tb") + bl)).cast(DoubleType))
    val terms = grid.select(col("grp"), col("bin"), col("a_n"), col("b_n"),
      round((pb - pa) * lnRatio * 1e6, 0).cast(LongType).as("term_micro"))
    val summary = terms.groupBy(col("grp").as("sg"))
      .agg(sum(col("term_micro")).as("psi_micro"))
    terms.join(broadcast(summary), col("grp") === col("sg"))
      .select(col("grp"), col("bin"), col("a_n"), col("b_n"),
        col("term_micro"), col("psi_micro"))
  }

  /** Finish a state snapshot into (grp, n_a, n_b, d_num, ks) — the
    * cumulative windows run over the state table only. */
  def ksFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // value-cardinality-bounded cumulative window per group
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = state
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("tA", sum(col("ca")).over(wAll))
      .withColumn("tB", sum(col("cb")).over(wAll))
    val agg = cum.groupBy("grp").agg(
      max(col("tA")).as("n_a"), max(col("tB")).as("n_b"),
      max(abs(col("cumA") * col("tB") - col("cumB") * col("tA")))
        .as("d_num"))
    agg.select(col("grp"), col("n_a"), col("n_b"), col("d_num"),
      round(when(col("n_a") === 0L || col("n_b") === 0L, 1.0)
        .otherwise(col("d_num").cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)), 6).as("ks"))
  }

  /** 1-D Wasserstein (earth mover's) distance per group between two
    * samples of a long-valued score — the drift MAGNITUDE beside
    * [[ksTest]]'s max-gap significance shape: KS says "the CDFs
    * differ somewhere by D"; W₁ = ∫|F_a − F_b| dx says "moving one
    * distribution onto the other costs this much score-mass·distance"
    * (a mean shift of δ gives W₁ ≈ δ where KS saturates). Finished
    * from the SAME algebraic (grp, value) → (ca, cb) state as
    * [[ksTest]] — the shared-state discipline of [[cliffsDelta]].
    *
    * Exactness: per-interval terms |cumA·n_b − cumB·n_a|·Δv are exact
    * longs summed order-free; the only IEEE step is the final
    * division by n_a·n_b. Exact while n_a·n_b·(v_max − v_min) < 2⁶³
    * (micro scores in [0, 1e6]: ~9·10¹² per-side-row products — far
    * above any per-group corpus). A group empty on either side
    * reports w1 = 0 with its n_a/n_b zero — unlike KS there is no
    * finite "maximal" distance to pin to; callers gate on the counts.
    *
    * Scale shape: identical to [[ksTest]] — one (group, value) count
    * shuffle per side (map-side combined), then cumulative + lead
    * windows over the pooled distinct-value table
    * (value-cardinality-bounded, never corpus-proportional).
    *
    * @param a,b rows with `groupCol` and `valueCol` (long-castable)
    * @return (grp, n_a, n_b, w1_num, w1) — w1 in `valueCol` units, 6dp */
  def wasserstein1(a: DataFrame, b: DataFrame, groupCol: String = "group",
      valueCol: String = "v"): DataFrame = {
    val tagged = a
      .select(col(groupCol).as("grp"), col(valueCol).cast(LongType).as("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col(groupCol).as("grp"),
        col(valueCol).cast(LongType).as("v"), lit(1L).as("side")))
    w1Finish(ksState(tagged))
  }

  /** Finish a KS-state snapshot into (grp, n_a, n_b, w1_num, w1) —
    * the [[ksFinish]] windows plus one lead() for the interval width;
    * state-table-bounded like every shared-state finish. */
  def w1Finish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wLead = Window.partitionBy("grp").orderBy("v")
    val cum = state
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("tA", sum(col("ca")).over(wAll))
      .withColumn("tB", sum(col("cb")).over(wAll))
      .withColumn("nextV", lead(col("v"), 1).over(wLead))
    val agg = cum.groupBy("grp").agg(
      max(col("tA")).as("n_a"), max(col("tB")).as("n_b"),
      sum(when(col("nextV").isNull, 0L).otherwise(
        abs(col("cumA") * col("tB") - col("cumB") * col("tA")) *
          (col("nextV") - col("v")))).as("w1_num"))
    agg.select(col("grp"), col("n_a"), col("n_b"), col("w1_num"),
      round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
        .otherwise(col("w1_num").cast(DoubleType) /
          (col("n_a") * col("n_b")).cast(DoubleType)), 6).as("w1"))
  }

  /** Two-sample Cramér–von Mises statistic per group — the
    * WHOLE-CURVE drift test completing the trio on the shared
    * (grp, value) state: [[ksTest]] reads the single worst CDF gap,
    * [[wasserstein1]] the area between the CDFs, and CvM the
    * pooled-weighted SQUARED gap T = (n_a·n_b/N²)·Σ_x w_x·(F_a(x) −
    * F_b(x))² (w_x = pooled multiplicity) — sensitive to many small
    * departures a max-gap test under-weights (tail-shape drift).
    *
    * Exactness: the gap enters as the exact long cumA·n_b − cumB·n_a;
    * each distinct value's term w_x·(gap/(n_a·n_b))² is nano-rounded
    * to a long pre-sum (value-cardinality-bounded fold, order-free);
    * T is one fixed-shape IEEE expression, 6dp. A group empty on
    * either side reports 0 with its count zeroed (callers gate on
    * n_a/n_b, the [[wasserstein1]] contract).
    *
    * Scale shape: identical to [[ksTest]] — cumulative windows over
    * the pooled distinct-value table only.
    *
    * @param a,b rows with `groupCol` and `valueCol` (long-castable)
    * @return (grp, n_a, n_b, cvm) — cvm 6dp */
  def cramerVonMises(a: DataFrame, b: DataFrame,
      groupCol: String = "group", valueCol: String = "v"): DataFrame = {
    val tagged = a
      .select(col(groupCol).as("grp"), col(valueCol).cast(LongType).as("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col(groupCol).as("grp"),
        col(valueCol).cast(LongType).as("v"), lit(1L).as("side")))
    cvmFinish(ksState(tagged))
  }

  /** Finish a KS-state snapshot into (grp, n_a, n_b, cvm) — third
    * finish over the one drift accumulator. */
  def cvmFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def d(c: Column) = c.cast(DoubleType)
    val cum = state
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("tA", sum(col("ca")).over(wAll))
      .withColumn("tB", sum(col("cb")).over(wAll))
    val gapFrac = d(col("cumA") * col("tB") - col("cumB") * col("tA")) /
      (d(col("tA")) * d(col("tB")))
    val terms = cum.select(col("grp"), col("tA"), col("tB"),
      when(col("tA") === 0L || col("tB") === 0L, 0L).otherwise(
        round(d(col("ca") + col("cb")) * gapFrac * gapFrac * lit(1e9), 0)
          .cast(LongType)).as("term_nano"))
    val agg = terms.groupBy("grp").agg(
      max(col("tA")).as("n_a"), max(col("tB")).as("n_b"),
      sum(col("term_nano")).as("tsum"))
    val nTot = d(col("n_a")) + d(col("n_b"))
    agg.select(col("grp"), col("n_a"), col("n_b"),
      round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
        .otherwise(d(col("n_a")) * d(col("n_b")) / (nTot * nTot) *
          d(col("tsum")) / lit(1e9)), 6).as("cvm"))
  }

  /** Two-sample Anderson–Darling statistic per group — the
    * TAIL-WEIGHTED member completing the drift quartet on the shared
    * (grp, value) state: KS reads the worst gap, W₁ the area, CvM
    * the pooled squared gap, and AD re-weights the squared gap by
    * 1/(F(1−F)) so departures in the DISTRIBUTION TAILS — where
    * rare-token and outlier drift lives — count hardest. The
    * Scholz–Stephens (1987) midrank tie version: with B_j the
    * mid-block pooled count and M_j the mid-block count from sample
    * A, A² = (N−1)/N² · (1/n_a + 1/n_b) ·
    * Σ_j t_j·(N·M_j − n_a·B_j)² / (B_j(N−B_j) − N·t_j/4).
    *
    * Exactness: carried in DOUBLED block counts (2B and 2M are exact
    * longs even at half-block midpoints — the [[mannWhitney]] mid-
    * rank discipline), which cancels the /4 exactly:
    * (N·M − n_a·B)²/(B(N−B) − Nt/4) = (N·m2 − n_a·b2)²/(b2(2N−b2) −
    * N·t). Each value's fully-scaled term is nano-rounded pre-sum
    * (value-cardinality-bounded, order-free); A² is the final /1e9.
    * Blocks with a zero denominator (a single block spanning the
    * pool) drop out; a group empty on either side reports 0 with its
    * count zeroed (the [[wasserstein1]] contract).
    *
    * Scale shape: identical to [[ksTest]] — cumulative windows over
    * the pooled distinct-value table only.
    *
    * @param a,b rows with `groupCol` and `valueCol` (long-castable)
    * @return (grp, n_a, n_b, a2) — a2 6dp */
  def andersonDarling(a: DataFrame, b: DataFrame,
      groupCol: String = "group", valueCol: String = "v"): DataFrame = {
    val tagged = a
      .select(col(groupCol).as("grp"), col(valueCol).cast(LongType).as("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col(groupCol).as("grp"),
        col(valueCol).cast(LongType).as("v"), lit(1L).as("side")))
    adFinish(ksState(tagged))
  }

  /** Finish a KS-state snapshot into (grp, n_a, n_b, a2) — fourth
    * finish over the one drift accumulator. */
  def adFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def d(c: Column) = c.cast(DoubleType)
    val cum = state
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("tA", sum(col("ca")).over(wAll))
      .withColumn("tB", sum(col("cb")).over(wAll))
    val nTot = col("tA") + col("tB")
    val t = col("ca") + col("cb")
    val b2 = lit(2L) * (col("cumA") + col("cumB")) - t // doubled mid-B
    val m2 = lit(2L) * col("cumA") - col("ca")         // doubled mid-M
    val num = nTot * m2 - col("tA") * b2               // exact long
    val den = b2 * (lit(2L) * nTot - b2) - nTot * t    // exact long
    val cFac = (d(nTot) - 1.0) / (d(nTot) * d(nTot)) *
      (lit(1.0) / d(col("tA")) + lit(1.0) / d(col("tB")))
    val terms = cum.select(col("grp"), col("tA"), col("tB"),
      when(col("tA") === 0L || col("tB") === 0L || den <= 0L, 0L)
        .otherwise(round(cFac * d(t) * d(num) * d(num) / d(den) * lit(1e9),
          0).cast(LongType)).as("term_nano"))
    val agg = terms.groupBy("grp").agg(
      max(col("tA")).as("n_a"), max(col("tB")).as("n_b"),
      sum(col("term_nano")).as("tsum"))
    agg.select(col("grp"), col("n_a"), col("n_b"),
      round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
        .otherwise(d(col("tsum")) / lit(1e9)), 6).as("a2"))
  }

  /** Weighted Cohen's κ per group over paired ORDINAL ratings — the
    * LLM-judge agreement metric ([[cohenKappa]] is nominal; two
    * judges scoring 1–5 that differ by one point are NOT in full
    * disagreement). Quadratic weights w_ij = (i−j)² (QWK, the essay-
    * scoring standard) and linear |i−j| both report:
    * κ_w = 1 − Σ w·O / Σ w·E with E_ij = row_i·col_j / n, which
    * algebraically is 1 − n·Σ(w·O) / Σ(w·row·col) — exact long
    * arithmetic end to end, ONE final division, 6dp. A group whose
    * marginals admit no weighted disagreement (both raters constant)
    * reports κ = 1 by convention (the observed weighted disagreement
    * is then provably 0 too).
    *
    * Scale shape: one (grp, r1, r2) aggregation (cells bounded by the
    * score domain squared), marginals from the cells table, and an
    * in-group cells×cells join bounded by the score domain — never
    * corpus-quadratic.
    *
    * @return (grp, n, kappa_linear, kappa_quadratic) */
  def weightedKappa(ratings: DataFrame, groupCol: String = "group",
      r1Col: String = "r1", r2Col: String = "r2"): DataFrame = {
    val cells = ratings.select(col(groupCol).as("grp"),
        col(r1Col).cast(LongType).as("i"), col(r2Col).cast(LongType).as("j"))
      .groupBy("grp", "i", "j").agg(count(lit(1)).as("o"))
    def wq(a: Column, b: Column) = (a - b) * (a - b)
    def wl(a: Column, b: Column) = abs(a - b)
    val obs = cells.groupBy("grp").agg(
      sum(col("o")).as("n"),
      sum(wl(col("i"), col("j")) * col("o")).as("wol"),
      sum(wq(col("i"), col("j")) * col("o")).as("woq"))
    val rows = cells.groupBy("grp", "i").agg(sum(col("o")).as("ri"))
    val cols = cells.groupBy("grp", "j").agg(sum(col("o")).as("cj"))
    val exp = rows.join(cols, Seq("grp"))
      .groupBy("grp").agg(
        sum(wl(col("i"), col("j")) * col("ri") * col("cj")).as("wel"),
        sum(wq(col("i"), col("j")) * col("ri") * col("cj")).as("weq"))
    obs.join(exp, Seq("grp"))
      .select(col("grp"), col("n"),
        round(when(col("wel") === 0L, 1.0).otherwise(
          lit(1.0) - (col("n") * col("wol")).cast(DoubleType) /
            col("wel").cast(DoubleType)), 6).as("kappa_linear"),
        round(when(col("weq") === 0L, 1.0).otherwise(
          lit(1.0) - (col("n") * col("woq")).cast(DoubleType) /
            col("weq").cast(DoubleType)), 6).as("kappa_quadratic"))
  }

  /** Rank correlation between two integer metrics per group — do two
    * rankers agree? (two quality scorers over a corpus, an ANN
    * shortlist vs the exact ranking, an LLM judge vs a heuristic):
    * Spearman's ρ with proper average-rank tie handling, and Kendall's
    * τ-b (tie-corrected) over a deterministically capped subset.
    *
    * Exactness contract: average ranks are carried DOUBLED (2·r̄ =
    * 2·rank_min + ties − 1, an exact long); ρ is the Pearson formula
    * over those longs — one IEEE division of exact products, 6dp.
    * τ-b counts concordant/discordant pairs exactly over the first
    * `maxPerGroup` rows by id per group (pairs are quadratic — the cap
    * is the documented contract, the same eval-shaped bound as
    * [[aucRoc]]'s score windows; ρ has no cap).
    *
    * Scale shape: ρ is two group-bounded rank windows + one exact
    * aggregation. τ-b's pair join is equi-keyed on the group and
    * bounded by the cap — never corpus-quadratic.
    *
    * @return (grp, n, spearman_rho, n_tau, kendall_tau_b) */
  def rankCorrelation(df: DataFrame, groupCol: String, idCol: String,
      xCol: String, yCol: String, maxPerGroup: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
    def ar2(c: String) = {
      val w = Window.partitionBy("grp").orderBy(col(c))
      (rank().over(w) * 2 + count(lit(1))
        .over(Window.partitionBy("grp", c)) - lit(1)).cast(LongType)
    }
    val ranked = base
      .withColumn("rx", ar2("x")).withColumn("ry", ar2("y"))
    val rho = ranked.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
      .select(col("grp"), col("n"),
        round(when((col("n") * col("sxx") === col("sx") * col("sx")) ||
            (col("n") * col("syy") === col("sy") * col("sy")), 0.0)
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast(DoubleType) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast(DoubleType) *
              (col("n") * col("syy") - col("sy") * col("sy"))
                .cast(DoubleType))), 6).as("spearman_rho"))
    val capped = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy("id")))
      .filter(col("rn") <= maxPerGroup)
      .select(col("grp"), col("id"), col("x"), col("y"))
    val pairs = capped.alias("a")
      .join(capped.alias("b"),
        col("a.grp") === col("b.grp") && col("a.id") < col("b.id"))
      .select(col("a.grp").as("grp"),
        (signum((col("a.x") - col("b.x")).cast(DoubleType)) *
          signum((col("a.y") - col("b.y")).cast(DoubleType)))
          .cast(LongType).as("s"),
        (col("a.x") === col("b.x")).cast(LongType).as("tx"),
        (col("a.y") === col("b.y")).cast(LongType).as("ty"))
    val tau = pairs.groupBy("grp").agg(
      sum(when(col("s") === 1L, 1L).otherwise(0L)).as("c"),
      sum(when(col("s") === -1L, 1L).otherwise(0L)).as("d"),
      sum(col("tx")).as("n1"), sum(col("ty")).as("n2"),
      count(lit(1)).as("n0"))
      .select(col("grp"),
        round(when(col("n0") === col("n1") || col("n0") === col("n2"), 0.0)
          .otherwise((col("c") - col("d")).cast(DoubleType) /
            sqrt((col("n0") - col("n1")).cast(DoubleType) *
              (col("n0") - col("n2")).cast(DoubleType))), 6)
          .as("kendall_tau_b"))
    val nTau = capped.groupBy("grp").agg(count(lit(1)).as("n_tau"))
    // total outputs: a group with <2 capped rows has no pairs — τ
    // reports 0 (no evidence), never NULL
    rho.join(nTau, Seq("grp"), "left").join(tau, Seq("grp"), "left")
      .withColumn("n_tau", coalesce(col("n_tau"), lit(0L)))
      .withColumn("kendall_tau_b", coalesce(col("kendall_tau_b"), lit(0.0)))
  }

  /** Two-proportion pooled z-test — the A/B experiment readout:
    * within each group (experiment/metric), arm sizes, conversion
    * counts and rates, and the pooled z statistic
    * (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂)). All inputs are exact long
    * counts; the statistic is fixed-shape IEEE arithmetic on them,
    * 6dp-rounded, so any engine replays it. Zero-variance or empty
    * arms emit z = 0 (no evidence, not ±∞).
    *
    * Scale shape: ONE corpus aggregation with map-side combine; the
    * statistic lives on the groups-sized result.
    *
    * @return (grp, n_a, n_b, conv_a, conv_b, rate_a, rate_b, z) */
  def abTest(df: DataFrame, groupCol: String, armCol: String,
      convCol: String): DataFrame = {
    val agg = df.select(col(groupCol).as("grp"),
        col(armCol).cast(LongType).as("arm"),
        col(convCol).cast(LongType).as("conv"))
      .groupBy("grp").agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") =!= 0L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") =!= 0L, col("conv")).otherwise(0L)).as("conv_b"))
    val pA = col("conv_a").cast(DoubleType) / col("n_a").cast(DoubleType)
    val pB = col("conv_b").cast(DoubleType) / col("n_b").cast(DoubleType)
    val pPool = (col("conv_a") + col("conv_b")).cast(DoubleType) /
      (col("n_a") + col("n_b")).cast(DoubleType)
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n_a").cast(DoubleType) +
        lit(1.0) / col("n_b").cast(DoubleType)))
    agg.select(col("grp"), col("n_a"), col("n_b"),
      col("conv_a"), col("conv_b"),
      round(when(col("n_a") === 0L, 0.0).otherwise(pA), 6).as("rate_a"),
      round(when(col("n_b") === 0L, 0.0).otherwise(pB), 6).as("rate_b"),
      round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
        .otherwise(when(se === 0.0, 0.0).otherwise((pA - pB) / se)), 6)
        .as("z"))
  }

  /** Difference-in-differences estimator — the quasi-experimental
    * readout when treatment wasn't randomized at the metric grain
    * (a rollout, a policy change): DiD = (post_t − pre_t) −
    * (post_c − pre_c) strips both the group baseline and the common
    * time trend; the z comes from the four independent cell
    * variances (the standard two-period two-group form).
    *
    * Exactness: per-cell n/Σy/Σy² are exact long sums (y in integer
    * micros; Σy² < 2⁶³ while n·y²_max does — documented bound); the
    * means, cell variances ((nΣy²−(Σy)²)/(n(n−1))), DiD, and z are
    * fixed-shape doubles over those longs, 6dp. Any cell with n < 2
    * reports z = 0 (variance undefined), and a missing cell reports
    * nothing for the group (all four corners are required).
    *
    * Scale shape: ONE corpus aggregation map-side combined to
    * groups×4 cells, then a groups-sized finish.
    *
    * @param df (group, arm 0/1, period 0/1 pre/post, y_micro)
    * @return (grp, n00, n01, n10, n11, m00, m01, m10, m11,
    *         did_micro, z) — m_ap = mean of arm a in period p */
  def didEstimate(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", periodCol: String = "period",
      yCol: String = "y_micro"): DataFrame = {
    val base = df.select(col(groupCol).as("grp"),
      col(armCol).cast(LongType).as("a"),
      col(periodCol).cast(LongType).as("p"),
      col(yCol).cast(LongType).as("y"))
    def cell(a: Int, p: Int, e: Column): Column =
      sum(when(col("a") === a.toLong && col("p") === p.toLong, e)
        .otherwise(0L))
    val agg = base.groupBy("grp").agg(
      cell(0, 0, lit(1L)).as("n00"), cell(0, 1, lit(1L)).as("n01"),
      cell(1, 0, lit(1L)).as("n10"), cell(1, 1, lit(1L)).as("n11"),
      cell(0, 0, col("y")).as("s00"), cell(0, 1, col("y")).as("s01"),
      cell(1, 0, col("y")).as("s10"), cell(1, 1, col("y")).as("s11"),
      cell(0, 0, col("y") * col("y")).as("q00"),
      cell(0, 1, col("y") * col("y")).as("q01"),
      cell(1, 0, col("y") * col("y")).as("q10"),
      cell(1, 1, col("y") * col("y")).as("q11"))
    def m(s: String, n: String): Column =
      col(s).cast(DoubleType) / col(n).cast(DoubleType)
    def v(q: String, s: String, n: String): Column =
      (col(n).cast(DoubleType) * col(q).cast(DoubleType) -
        col(s).cast(DoubleType) * col(s).cast(DoubleType)) /
        (col(n).cast(DoubleType) * (col(n).cast(DoubleType) - lit(1.0)))
    val did = (m("s11", "n11") - m("s10", "n10")) -
      (m("s01", "n01") - m("s00", "n00"))
    val se = sqrt(v("q00", "s00", "n00") / col("n00").cast(DoubleType) +
      v("q01", "s01", "n01") / col("n01").cast(DoubleType) +
      v("q10", "s10", "n10") / col("n10").cast(DoubleType) +
      v("q11", "s11", "n11") / col("n11").cast(DoubleType))
    val tiny = col("n00") < 2L || col("n01") < 2L ||
      col("n10") < 2L || col("n11") < 2L
    agg
      .filter(col("n00") > 0L && col("n01") > 0L &&
        col("n10") > 0L && col("n11") > 0L)
      .select(col("grp"), col("n00"), col("n01"), col("n10"), col("n11"),
        round(m("s00", "n00"), 6).as("m00"), round(m("s01", "n01"), 6).as("m01"),
        round(m("s10", "n10"), 6).as("m10"), round(m("s11", "n11"), 6).as("m11"),
        round(did, 6).as("did_micro"),
        round(when(tiny, 0.0).otherwise(
          when(se === 0.0, 0.0).otherwise(did / se)), 6).as("z"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — the standard
    * pre-experiment covariate adjustment: θ = cov(X,Y)/var(X) over
    * the whole group, adjusted metric Y − θ(X − X̄). Per-arm adjusted
    * mean and the variance-reduction share are derived ALGEBRAICALLY
    * (mean_adj = ȳ_a − θ(x̄_a − x̄); var_adj = var_a(Y) −
    * 2θ·cov_a(X,Y) + θ²·var_a(X)) from exact long sums — no per-row
    * double ever folds, so the whole report is order-free and
    * replayable.
    *
    * Scale shape: ONE aggregation to (group, arm) cells plus a
    * groups-sized rollup for θ/X̄; nothing corpus-proportional after
    * the first combine.
    *
    * @param df (group, arm 0/1, y_micro, x_micro) — one row per unit
    * @return (grp, arm, n, mean_y, mean_adj, theta, var_reduction) */
  def cupedAdjust(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", yCol: String = "y_micro",
      xCol: String = "x_micro"): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"),
        col(armCol).cast(LongType).as("arm"),
        col(yCol).cast(LongType).as("y"), col(xCol).cast(LongType).as("x"))
      .groupBy("grp", "arm").agg(count(lit(1)).as("n"),
        sum(col("y")).as("sy"), sum(col("x")).as("sx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .localCheckpoint() // arms-sized; feeds per-arm AND the pooled θ
    val pooled = cells.groupBy("grp").agg(
      sum(col("n")).as("tn"), sum(col("sy")).as("tsy"),
      sum(col("sx")).as("tsx"), sum(col("sxx")).as("tsxx"),
      sum(col("sxy")).as("tsxy"))
    def d(c: Column): Column = c.cast(DoubleType)
    val varXNum = d(col("tn")) * d(col("tsxx")) - d(col("tsx")) * d(col("tsx"))
    val theta = when(varXNum === 0.0, 0.0).otherwise(
      (d(col("tn")) * d(col("tsxy")) - d(col("tsx")) * d(col("tsy"))) / varXNum)
    val xbar = d(col("tsx")) / d(col("tn"))
    val withT = cells.join(broadcast(
      pooled.select(col("grp"), theta.as("th"), xbar.as("xb"))), Seq("grp"))
    val meanY = d(col("sy")) / d(col("n"))
    val meanX = d(col("sx")) / d(col("n"))
    val nD = d(col("n"))
    val varY = (nD * d(col("syy")) - d(col("sy")) * d(col("sy"))) /
      (nD * (nD - lit(1.0)))
    val varX = (nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))) /
      (nD * (nD - lit(1.0)))
    val covXY = (nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (nD * (nD - lit(1.0)))
    val varAdj = varY - lit(2.0) * col("th") * covXY +
      col("th") * col("th") * varX
    val out = withT.select(col("grp"), col("arm"), col("n"),
        round(meanY, 6).as("mean_y"),
        round(meanY - col("th") * (meanX - col("xb")), 6).as("mean_adj"),
        round(col("th"), 6).as("theta"),
        round(when(col("n") < 2L || varY === 0.0, 0.0)
          .otherwise(lit(1.0) - varAdj / varY), 6).as("var_reduction"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells)
    out
  }

  /** Per-class precision/recall/F1 from a confusion-count table
    * ((label, pred_label, n) — the [[graft.ext.Similarity.knnClassify]]
    * / centroidClassify output shape), the standard classification
    * report a labeling pipeline reads before trusting a gate model.
    *
    * Exactness contract: tp/fp/fn are exact long sums;
    * precision/recall are the integer micro floors tp·10⁶/(tp+fp) and
    * tp·10⁶/(tp+fn); F1 is the integer micro 2·p·r/(p+r) computed on
    * those micros — all truncating long division on non-negative
    * longs, replayed exactly by DuckDB `//`.
    *
    * Scale shape: lives entirely on the classes²-bounded confusion
    * table — three small aggregations and a join.
    *
    * @return (label, support, tp, fp, fn, precision_micro,
    *         recall_micro, f1_micro) */
  def classificationReport(confusion: DataFrame): DataFrame = {
    val tp = confusion.filter(col("label") === col("pred_label"))
      .groupBy("label").agg(sum(col("n")).as("tp"))
    val byTrue = confusion.groupBy("label")
      .agg(sum(col("n")).as("support"))
    val byPred = confusion.groupBy(col("pred_label").as("label"))
      .agg(sum(col("n")).as("pred_n"))
    byTrue
      .join(byPred, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("pred_n"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision_micro", when(col("tp") + col("fp") === 0L, 0L)
        .otherwise(expr("(tp * CAST(1000000 AS BIGINT)) div (tp + fp)")))
      .withColumn("recall_micro", when(col("tp") + col("fn") === 0L, 0L)
        .otherwise(expr("(tp * CAST(1000000 AS BIGINT)) div (tp + fn)")))
      .withColumn("f1_micro",
        when(col("precision_micro") + col("recall_micro") === 0L, 0L)
          .otherwise(expr(
            "(2 * precision_micro * recall_micro) div (precision_micro + recall_micro)")))
  }

  /** DeLong's test for comparing two correlated ROC-AUCs (DeLong,
    * DeLong & Clarke-Pearson 1988) — the rank-side companion to
    * [[mcnemar]]: both models score the SAME examples, so the AUC
    * difference must be tested with the paired covariance, not two
    * independent AUC variances. Uses the structural-component
    * formulation: per positive i, V10(i) = P̂(s_i > s_neg) with ½ for
    * ties; per negative j, V01(j) likewise against positives;
    * AUC = mean V10, and Var(θ̂_A−θ̂_B) =
    * (S10_A + S10_B − 2·S10_AB)/n_pos + (S01_A + S01_B − 2·S01_AB)/n_neg
    * with S the sample (co)variances of the components.
    *
    * Exactness contract: each component is an exact INTEGER
    * (2·negBelow + negEq, scale 2·n_neg — the aucRoc u2 discipline,
    * derived from score-value count tables, never per-row ranks);
    * every Σv, Σv², Σv_A·v_B is an exact long (< 2⁵³ while
    * n·(2n)² stays under it — ~2·10⁵ examples per group, the
    * documented engine-parity bound for the final double cast); the
    * variance and z are fixed-shape double expressions over those
    * longs, 6dp. Groups with n_pos < 2 or n_neg < 2, or zero variance
    * (e.g. identical models), report z = 0.
    *
    * Scale shape: two score-value count tables (value-domain bounded)
    * with cumulative windows over VALUES, two keyed joins back to the
    * example table, ONE group aggregation — no pairwise expansion
    * anywhere.
    *
    * @param preds (group, y, score_a_micro, score_b_micro)
    * @return (grp, n_pos, n_neg, auc_a, auc_b, var_diff, z) */
  def delongTest(preds: DataFrame, groupCol: String = "group",
      yCol: String = "y", aCol: String = "score_a_micro",
      bCol: String = "score_b_micro"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = preds.select(col(groupCol).as("grp"),
        col(yCol).cast(LongType).as("y"),
        col(aCol).cast(LongType).as("sa"), col(bCol).cast(LongType).as("sb"))
      .localCheckpoint() // feeds two value tables + the example pass
    def valueTable(scoreCol: String, v10: String, v01: String): DataFrame = {
      val w = Window.partitionBy("grp").orderBy("s")
      base.groupBy(col("grp"), col(scoreCol).as("s"))
        .agg(sum(col("y")).as("pos"),
          (count(lit(1)) - sum(col("y"))).as("neg"))
        .withColumn("negBelow", coalesce(sum(col("neg")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("posAbove", coalesce(sum(col("pos")).over(
          w.rowsBetween(1, Window.unboundedFollowing)), lit(0L)))
        .select(col("grp"), col("s").as(scoreCol),
          (lit(2L) * col("negBelow") + col("neg")).as(v10),
          (lit(2L) * col("posAbove") + col("pos")).as(v01))
    }
    val joined = base
      .join(valueTable("sa", "v10a", "v01a"), Seq("grp", "sa"))
      .join(valueTable("sb", "v10b", "v01b"), Seq("grp", "sb"))
    def s1(c: Column) = sum(when(col("y") === 1L, c).otherwise(0L))
    def s0(c: Column) = sum(when(col("y") === 0L, c).otherwise(0L))
    val agg = joined.groupBy("grp").agg(
      sum(col("y")).as("n_pos"),
      (count(lit(1)) - sum(col("y"))).as("n_neg"),
      s1(col("v10a")).as("sa10"), s1(col("v10b")).as("sb10"),
      s1(col("v10a") * col("v10a")).as("saa10"),
      s1(col("v10b") * col("v10b")).as("sbb10"),
      s1(col("v10a") * col("v10b")).as("sab10"),
      s0(col("v01a")).as("sa01"), s0(col("v01b")).as("sb01"),
      s0(col("v01a") * col("v01a")).as("saa01"),
      s0(col("v01b") * col("v01b")).as("sbb01"),
      s0(col("v01a") * col("v01b")).as("sab01"))
    // sample covariance of two scaled component columns, in TRUE
    // units: (Σxy − ΣxΣy/n)/(n−1)/denom² — one canonical shape,
    // mirrored verbatim by the oracle
    def cov(sxy: Column, sx: Column, sy: Column, n: Column,
        denom: Column): Column =
      (sxy.cast(DoubleType) -
        sx.cast(DoubleType) * sy.cast(DoubleType) / n.cast(DoubleType)) /
        (n.cast(DoubleType) - lit(1.0)) /
        (denom.cast(DoubleType) * denom.cast(DoubleType))
    val d10 = lit(2L) * col("n_neg"); val d01 = lit(2L) * col("n_pos")
    val varDiff =
      (cov(col("saa10"), col("sa10"), col("sa10"), col("n_pos"), d10) +
        cov(col("sbb10"), col("sb10"), col("sb10"), col("n_pos"), d10) -
        lit(2.0) * cov(col("sab10"), col("sa10"), col("sb10"), col("n_pos"), d10)) /
        col("n_pos").cast(DoubleType) +
      (cov(col("saa01"), col("sa01"), col("sa01"), col("n_neg"), d01) +
        cov(col("sbb01"), col("sb01"), col("sb01"), col("n_neg"), d01) -
        lit(2.0) * cov(col("sab01"), col("sa01"), col("sb01"), col("n_neg"), d01)) /
        col("n_neg").cast(DoubleType)
    val scale = (col("n_pos") * lit(2L) * col("n_neg")).cast(DoubleType)
    val aucA = col("sa10").cast(DoubleType) / scale
    val aucB = col("sb10").cast(DoubleType) / scale
    val diff = (col("sa10") - col("sb10")).cast(DoubleType) / scale
    val out = agg.select(col("grp"), col("n_pos"), col("n_neg"),
      round(when(col("n_pos") === 0L || col("n_neg") === 0L, 0.5)
        .otherwise(aucA), 6).as("auc_a"),
      round(when(col("n_pos") === 0L || col("n_neg") === 0L, 0.5)
        .otherwise(aucB), 6).as("auc_b"),
      round(when(col("n_pos") < 2L || col("n_neg") < 2L, 0.0)
        .otherwise(varDiff), 6).as("var_diff"),
      round(when(col("n_pos") < 2L || col("n_neg") < 2L, 0.0)
        .otherwise(when(varDiff <= 0.0, 0.0)
          .otherwise(diff / sqrt(varDiff))), 6).as("z"))
      .localCheckpoint() // groups-sized; frees the example pin
    graft.ext.Checkpoints.release(base)
    out
  }

  /** Split-conformal threshold calibration (Vovk et al.; the
    * distribution-free coverage guarantee): from a CALIBRATION split
    * of nonconformity scores, the (1−α) threshold is the k-th
    * smallest with k = ⌈(n+1)(1−α)⌉ — any exchangeable future score
    * then lands at or below it with probability ≥ 1−α. The report
    * also measures the guarantee on a held-out TEST split, the
    * "measure, don't guess" loop for gate thresholds (a quality gate
    * tuned by eye has no coverage statement; this one does).
    *
    * Exactness: k is exact integer arithmetic
    * ((n+1)·(1000−α‰)+999 div 1000); the order statistic is selected
    * by cumulative counts over the VALUE domain, never a per-row
    * rank; coverage is one 6dp division. k > n (tiny calibration
    * sets) pins the threshold at the domain max 10⁶ — cover
    * everything, the standard convention.
    *
    * Scale shape: one (group, value) count shuffle; the cumulative
    * window runs over the micro-score VALUE domain (≤ 1e6+1 rows per
    * group regardless of corpus size — the domainCapApprox
    * discipline); thresholds broadcast to the test pass.
    *
    * @param scores (group, split 'cal'|'test', s_micro in [0, 1e6])
    * @return (grp, n_cal, k, threshold_micro, n_test, n_cov,
    *         coverage) */
  def conformalThreshold(scores: DataFrame, alphaPermille: Int = 100,
      groupCol: String = "group", splitCol: String = "split",
      sCol: String = "s_micro"): DataFrame =
    conformalFinish(
      conformalState(scores, groupCol, splitCol, sCol), alphaPermille)

  /** The ALGEBRAIC accumulator behind [[conformalThreshold]]: counts
    * per (group, split, value) — micro-batches merge freely and the
    * state is value-domain-bounded (≤ 2·(1e6+1) rows per group), the
    * streaming-twin state
    * ([[graft.streaming.StreamingOps.conformalStateStream]]). */
  private[graft] def conformalState(scores: DataFrame,
      groupCol: String = "group", splitCol: String = "split",
      sCol: String = "s_micro"): DataFrame =
    scores.select(col(groupCol).as("grp"), col(splitCol).as("split"),
        col(sCol).cast(LongType).as("s"))
      .groupBy("grp", "split", "s").agg(count(lit(1)).as("c"))

  /** Finish a [[conformalState]] snapshot into the threshold-and-
    * coverage report — value-domain-sized input, identical result
    * from one batch pass or merged micro-batches. A group with
    * calibration rows but NO test rows still reports its calibrated
    * threshold (n_test=0, n_cov=0, coverage=null) — a live gate
    * monitor must not lose the threshold during a lull in held-out
    * traffic. */
  def conformalFinish(state: DataFrame,
      alphaPermille: Int = 100): DataFrame = {
    val base = state.localCheckpoint() // cal pass + test pass
    val cal = base.filter(col("split") === "cal")
    val nCal = cal.groupBy("grp").agg(sum(col("c")).as("n_cal"))
      .withColumn("k", expr(
        s"((n_cal + 1) * ${1000 - alphaPermille} + 999) div 1000"))
    import org.apache.spark.sql.expressions.Window
    val cum = cal.withColumn("cum", sum(col("c")).over(
      Window.partitionBy("grp").orderBy("s")))
    val thr = cum.join(nCal, Seq("grp"))
      .filter(col("cum") >= col("k"))
      .groupBy("grp").agg(min(col("s")).as("thr0"))
    val thrAll = nCal.join(thr, Seq("grp"), "left")
      .select(col("grp"), col("n_cal"), col("k"),
        coalesce(col("thr0"), lit(1000000L)).as("threshold_micro"))
    val testCnt = base.filter(col("split") === "test")
      .join(broadcast(thrAll.select("grp", "threshold_micro")), Seq("grp"))
      .groupBy("grp")
      .agg(sum(col("c")).as("n_test0"),
        sum(when(col("s") <= col("threshold_micro"), col("c"))
          .otherwise(0L)).as("n_cov0"))
    // LEFT join — the calibrated threshold survives an empty test
    // split; coverage is null (unmeasured), never 0/0
    val out = thrAll.join(testCnt, Seq("grp"), "left")
      .select(col("grp"), col("n_cal"), col("k"), col("threshold_micro"),
        coalesce(col("n_test0"), lit(0L)).as("n_test"),
        coalesce(col("n_cov0"), lit(0L)).as("n_cov"))
      .withColumn("coverage",
        when(col("n_test") === 0L, lit(null).cast(DoubleType))
          .otherwise(round(col("n_cov").cast(DoubleType) /
            col("n_test").cast(DoubleType), 6)))
      .localCheckpoint()
    graft.ext.Checkpoints.release(base)
    out
  }

  /** McNemar's test for PAIRED classifiers — the significance question
    * the two-proportion [[abTest]] cannot answer when both models are
    * scored on the SAME examples (the paired design removes the
    * between-example variance; only the disagreements carry signal).
    * Counts the discordant pairs — n01 = A right, B wrong; n10 = A
    * wrong, B right — and the continuity-corrected statistic
    * (|n01 − n10| − 1)² / (n01 + n10), χ²(1df) under H₀ "equal error
    * rates". The standard readout before swapping a quality-gate
    * model for a challenger scored on the same eval slice.
    *
    * Exactness contract: all four cell counts are exact long sums;
    * the statistic is one fixed-shape double expression over them,
    * 6dp-rounded. Zero discordance → statistic 0.
    *
    * Scale shape: ONE corpus aggregation with map-side combine to a
    * groups-sized table.
    *
    * @param preds (group, y, pred_a, pred_b) — booleans/0-1
    * @return (grp, n, n_both, n01, n10, n_neither, chi2_cc) */
  def mcnemar(preds: DataFrame, groupCol: String = "group",
      yCol: String = "y", aCol: String = "pred_a",
      bCol: String = "pred_b"): DataFrame = {
    val ca = (col(aCol).cast(LongType) === col(yCol).cast(LongType))
    val cb = (col(bCol).cast(LongType) === col(yCol).cast(LongType))
    val agg = preds.select(col(groupCol).as("grp"),
        ca.as("ok_a"), cb.as("ok_b"))
      .groupBy("grp").agg(
        count(lit(1)).as("n"),
        sum(when(col("ok_a") && col("ok_b"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("ok_a") && !col("ok_b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("ok_a") && col("ok_b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("ok_a") && !col("ok_b"), 1L).otherwise(0L)).as("n_neither"))
    val disc = (col("n01") + col("n10")).cast(DoubleType)
    val num = (abs(col("n01") - col("n10")) - lit(1L)).cast(DoubleType)
    agg.select(col("grp"), col("n"), col("n_both"), col("n01"),
      col("n10"), col("n_neither"),
      round(when(col("n01") + col("n10") === 0L, 0.0)
        .otherwise(num * num / disc), 6).as("chi2_cc"))
  }

  /** Group-fairness audit of a binary classifier: per-group selection
    * rate, TPR, FPR, plus the gaps against the OVERALL rates —
    * demographic-parity gap (selection-rate delta) and the
    * equalized-odds gaps (TPR/FPR deltas). The first report a
    * labeling or filtering pipeline owes its audit before a gate
    * model is allowed to drop documents by group (language, source,
    * domain): a gate whose selection rate collapses for one language
    * silently rewrites the training mixture.
    *
    * Exactness contract: all cells are exact long sums; rates are
    * fixed-shape doubles 6dp-rounded; a group with no positives (or
    * negatives) reports TPR (FPR) as 0 — documented, not NULL, so
    * downstream thresholds don't need null-handling.
    *
    * Scale shape: ONE corpus aggregation with map-side combine to the
    * groups-sized table; the overall row is a broadcast-sized second
    * aggregate of the SAME partials (no second corpus pass).
    *
    * @param preds (group, y, pred) — booleans/0-1
    * @return (grp, n, n_pos, n_sel, n_tp, n_fp, sel_rate, tpr, fpr,
    *         dp_gap, tpr_gap, fpr_gap) */
  def fairnessReport(preds: DataFrame, groupCol: String = "group",
      yCol: String = "y", predCol: String = "pred"): DataFrame =
    fairnessFinish(fairnessState(preds, groupCol, yCol, predCol))

  /** The ALGEBRAIC per-group accumulator behind [[fairnessReport]] —
    * five commutative long sums per group, so micro-batches merge
    * freely and the state is groups rows forever (the streaming-twin
    * state, [[graft.streaming.StreamingOps.fairnessStateStream]]). */
  private[graft] def fairnessState(preds: DataFrame,
      groupCol: String = "group", yCol: String = "y",
      predCol: String = "pred"): DataFrame =
    preds.select(col(groupCol).as("grp"),
        col(yCol).cast(LongType).as("y"),
        col(predCol).cast(LongType).as("p"))
      .groupBy("grp").agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(col("p")).as("n_sel"),
        sum(col("y") * col("p")).as("n_tp"),
        sum((lit(1L) - col("y")) * col("p")).as("n_fp"))

  /** Finish a [[fairnessState]] snapshot into the rates-and-gaps
    * report — groups-sized input, identical result whether the state
    * came from one batch pass or merged micro-batches. */
  def fairnessFinish(state: DataFrame): DataFrame = {
    val base = state.localCheckpoint() // feeds per-group AND overall
    val overall = base.agg(sum(col("n")).as("t_n"),
      sum(col("n_pos")).as("t_pos"), sum(col("n_sel")).as("t_sel"),
      sum(col("n_tp")).as("t_tp"), sum(col("n_fp")).as("t_fp"))
    def rate(num: Column, den: Column): Column =
      when(den === 0L, 0.0).otherwise(
        num.cast(DoubleType) / den.cast(DoubleType))
    val out = base.crossJoin(broadcast(overall))
      .select(col("grp"), col("n"), col("n_pos"), col("n_sel"),
        col("n_tp"), col("n_fp"),
        round(rate(col("n_sel"), col("n")), 6).as("sel_rate"),
        round(rate(col("n_tp"), col("n_pos")), 6).as("tpr"),
        round(rate(col("n_fp"), col("n") - col("n_pos")), 6).as("fpr"),
        round(rate(col("n_sel"), col("n")) -
          rate(col("t_sel"), col("t_n")), 6).as("dp_gap"),
        round(rate(col("n_tp"), col("n_pos")) -
          rate(col("t_tp"), col("t_pos")), 6).as("tpr_gap"),
        round(rate(col("n_fp"), col("n") - col("n_pos")) -
          rate(col("t_fp"), col("t_n") - col("t_pos")), 6).as("fpr_gap"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(base)
    out
  }

  /** Cochran's Q test per group — the k-classifier generalization of
    * [[mcnemar]] (do k binary gates scored on the SAME items have the
    * same marginal pass rate?): with G_j the j-th rater's pass count
    * and L_i the i-th item's passes,
    * Q = (k−1)·(k·ΣG_j² − N²) / (k·N − ΣL_i²) — the clear-fraction
    * identity keeps every numerator/denominator an EXACT long (no
    * N/k fractions), so the only IEEE step is the final division.
    * Items missing any rater carry no k-way signal and are excluded
    * (the test's complete-block requirement); a zero denominator
    * (all items unanimous) reports Q = 0.
    *
    * Scale shape: one (group, item) rollup and one (group, rater)
    * rollup over the ratings stream, both map-side combined; exact
    * while k·ΣG² < 2⁶³ (~10⁹ items per group at k ≤ 8).
    *
    * @param ratings one row per (item, rater) verdict: `groupCol`,
    *                `itemCol`, `raterCol`, `yCol` (0/1)
    * @return (grp, k, n_items, q) — q 6dp */
  def cochranQ(ratings: DataFrame, groupCol: String = "group",
      itemCol: String = "item", raterCol: String = "rater",
      yCol: String = "y"): DataFrame = {
    val base = ratings.select(col(groupCol).as("grp"),
      col(itemCol).as("item"), col(raterCol).as("rater"),
      col(yCol).cast(LongType).as("y"))
    // at most ONE verdict per (grp, item, rater): duplicate rating
    // rows would otherwise let an item pass the complete-block filter
    // (count(*) == k) while a rater is missing, AND double-count y in
    // L_i/G_j — the statistic would corrupt silently on a malformed
    // feed. max(y) is the deterministic collapse; after it, nr below
    // IS the distinct-rater count.
    val verdicts = base.groupBy("grp", "item", "rater")
      .agg(max(col("y")).as("y"))
      .localCheckpoint() // feeds k, perItem, AND perRater; released below
    val k = verdicts.groupBy("grp")
      .agg(countDistinct(col("rater")).as("k"))
    val perItem = verdicts.groupBy("grp", "item")
      .agg(count(lit(1)).as("nr"), sum(col("y")).as("li"))
    val complete = perItem.join(broadcast(k), Seq("grp"))
      .filter(col("nr") === col("k"))
      .localCheckpoint() // filters BOTH rollups below; released below
    val itemAgg = complete.groupBy("grp").agg(
      count(lit(1)).as("n_items"), sum(col("li")).as("n"),
      sum(col("li") * col("li")).as("l2"))
    val perRater = verdicts.join(complete.select(col("grp"), col("item")),
        Seq("grp", "item"), "left_semi")
      .groupBy("grp", "rater").agg(sum(col("y")).as("gj"))
      .groupBy("grp").agg(sum(col("gj") * col("gj")).as("g2"))
    val out = k.join(itemAgg, Seq("grp")).join(perRater, Seq("grp"))
      .select(col("grp"), col("k"), col("n_items"),
        round(when(col("k") * col("n") - col("l2") === 0L, 0.0)
          .otherwise(((col("k") - 1L) *
            (col("k") * col("g2") - col("n") * col("n"))).cast(DoubleType) /
            (col("k") * col("n") - col("l2")).cast(DoubleType)), 6).as("q"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(complete, verdicts)
    out
  }

  /** Precision–recall AUC per group — the ranking metric that stays
    * honest under heavy class imbalance, where [[aucRoc]] saturates:
    * sweeping thresholds down the distinct-score table (ties enter
    * wholesale, the standard step interpolation to the right),
    * AP = Σ_s ΔR_s·P_s with ΔR_s = pos_s/n_pos and
    * P_s = TP_s/(TP_s+FP_s) at the cumulative cut.
    *
    * Exactness: cumulative TP/FP are exact longs from the value-count
    * window; each step's ΔR·P term is rounded to a NANO long pre-sum,
    * the sum is exact, and the published pr_auc is one division +
    * 6dp. Groups with no positives report 0 (no recall axis exists);
    * no negatives gives P ≡ 1 and pr_auc = 1 by the same formula.
    *
    * Scale shape: identical to [[aucRoc]] — one (group, score) count
    * shuffle, then everything is score-cardinality-bounded.
    *
    * @param preds rows with `groupCol`, `scoreCol` (long micro),
    *              `yCol` (0/1)
    * @return (grp, n_pos, n_neg, pr_auc) — 6dp */
  def prAuc(preds: DataFrame, groupCol: String = "group",
      scoreCol: String = "score_micro", yCol: String = "y"): DataFrame =
    prAucFinish(aucRocState(preds, groupCol, scoreCol, yCol))

  /** Finish an [[aucRocState]] snapshot into the PR-AUC report — the
    * SAME state table serves ROC-AUC and PR-AUC (one streamed
    * accumulator, [[graft.streaming.StreamingOps.aucStateStream]],
    * two finishes), state-sized input, batch ≡ merged micro-batches. */
  def prAucFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy("grp").orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("grp")
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val terms = state
      .withColumn("tp", sum(col("pos")).over(wCum))
      .withColumn("fp", sum(col("neg")).over(wCum))
      .withColumn("n_pos", sum(col("pos")).over(wAll))
      .withColumn("n_neg", sum(col("neg")).over(wAll))
      .withColumn("term_nano", when(col("pos") === 0L || col("n_pos") === 0L, 0L)
        .otherwise(nano((col("pos").cast(DoubleType) /
          col("n_pos").cast(DoubleType)) *
          (col("tp").cast(DoubleType) /
            (col("tp") + col("fp")).cast(DoubleType)))))
    terms.groupBy("grp").agg(
        max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"),
        sum(col("term_nano")).as("ap_nano"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        round(when(col("n_pos") === 0L, 0.0)
          .otherwise(col("ap_nano").cast(DoubleType) / 1e9), 6).as("pr_auc"))
  }

  /** Log-rank test per group between two arms' survival curves — the
    * inferential companion of [[kaplanMeier]] (is arm 1's retention
    * curve different, censoring respected?): at each distinct event
    * time, arm 1's observed deaths vs the hypergeometric expectation
    * E₁ = d·n₁/n and variance V = d·(n₁/n)·(n₀/n)·(n−d)/(n−1);
    * χ² = (ΣO₁ − ΣE₁)²/ΣV.
    *
    * Exactness: per-time risk sets and death counts are exact longs
    * from cumulative windows; each E/V term is rounded to a NANO long
    * pre-sum; the χ² is a fixed-shape double over the exact sums,
    * 6dp. Times where the risk set has a single subject carry no
    * variance (n−1 = 0) and contribute E but no V — the standard
    * convention. Groups with ΣV = 0 report chi2 = 0.
    *
    * Scale shape: one (group, time) count shuffle map-side combined,
    * then distinct-time-bounded windows — the [[kaplanMeier]] shape.
    *
    * @param df one row per subject: `groupCol`, `armCol` (0/1),
    *           `tCol` (long bucket), `eventCol` (1 = event)
    * @return (grp, n_times, o1, e1, chi2) — e1/chi2 6dp */
  def logRank(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", tCol: String = "t",
      eventCol: String = "event"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(groupCol).as("grp"),
        col(armCol).cast(LongType).as("arm"),
        col(tCol).cast(LongType).as("t"),
        col(eventCol).cast(LongType).as("event"))
      .groupBy("grp", "t").agg(
        sum(col("arm") * col("event")).as("d1"),
        sum((lit(1L) - col("arm")) * col("event")).as("d0"),
        sum(col("arm")).as("all1"),
        count(lit(1)).as("alln"))
    val wAll = Window.partitionBy("grp")
    val wPrev = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    def dd(c: Column) = c.cast(DoubleType)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val risked = cells
      .withColumn("n1", sum(col("all1")).over(wAll) -
        coalesce(sum(col("all1")).over(wPrev), lit(0L)))
      .withColumn("n", sum(col("alln")).over(wAll) -
        coalesce(sum(col("alln")).over(wPrev), lit(0L)))
      .withColumn("d", col("d1") + col("d0"))
      .filter(col("d") > 0L)
    val n0 = col("n") - col("n1")
    val terms = risked.select(col("grp"), col("d1"),
      nano(dd(col("d")) * dd(col("n1")) / dd(col("n"))).as("e1_nano"),
      when(col("n") <= 1L, 0L).otherwise(
        nano(dd(col("d")) * (dd(col("n1")) / dd(col("n"))) *
          (dd(n0) / dd(col("n"))) * (dd(col("n")) - dd(col("d"))) /
          (dd(col("n")) - 1.0))).as("v_nano"))
    val agg = terms.groupBy("grp").agg(count(lit(1)).as("n_times"),
      sum(col("d1")).as("o1"), sum(col("e1_nano")).as("se"),
      sum(col("v_nano")).as("sv"))
    val dev = dd(col("o1")) - dd(col("se")) / 1e9
    agg.select(col("grp"), col("n_times"), col("o1"),
      round(dd(col("se")) / 1e9, 6).as("e1"),
      round(when(col("sv") === 0L, 0.0)
        .otherwise(dev * dev / (dd(col("sv")) / 1e9)), 6).as("chi2"))
  }

  /** Standardized effect size per group for a two-arm metric — the
    * "is it LARGE, not just significant" readout beside [[abTest]]'s
    * z: Cohen's d = (mean_b − mean_a)/s_pooled with the unbiased
    * pooled variance, and Hedges' g = J·d with the small-sample
    * correction J = 1 − 3/(4(n_a+n_b)−9).
    *
    * Exactness: per-arm n/Σy/Σy² are exact long sums (y in an
    * integer scale the CALLER picks so n·y²_max < 2⁶³ — cents for
    * money-sized metrics, the [[didEstimate]] bound); means, pooled
    * variance, d and g are fixed-shape doubles over those longs,
    * 6dp. An arm with n < 2, or zero pooled variance, reports
    * d = g = 0.
    *
    * Scale shape: ONE corpus aggregation map-side combined to a
    * groups-sized table.
    *
    * @param df rows with `groupCol`, `armCol` (0 = a, else b),
    *           `yCol` (long, caller-scaled)
    * @return (grp, n_a, n_b, mean_a, mean_b, d, g) — 6dp */
  def effectSize(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", yCol: String = "y"): DataFrame = {
    val agg = df.select(col(groupCol).as("grp"),
        col(armCol).cast(LongType).as("arm"), col(yCol).cast(LongType).as("y"))
      .groupBy("grp").agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") =!= 0L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("sa"),
        sum(when(col("arm") =!= 0L, col("y")).otherwise(0L)).as("sb"),
        sum(when(col("arm") === 0L, col("y") * col("y")).otherwise(0L)).as("qa"),
        sum(when(col("arm") =!= 0L, col("y") * col("y")).otherwise(0L)).as("qb"))
    def dd(c: Column) = c.cast(DoubleType)
    val meanA = dd(col("sa")) / dd(col("n_a"))
    val meanB = dd(col("sb")) / dd(col("n_b"))
    // unbiased per-arm variance (n·Σy² − (Σy)²)/(n(n−1)), exact-long
    // numerators
    val varA = dd(col("n_a") * col("qa") - col("sa") * col("sa")) /
      (dd(col("n_a")) * (dd(col("n_a")) - 1.0))
    val varB = dd(col("n_b") * col("qb") - col("sb") * col("sb")) /
      (dd(col("n_b")) * (dd(col("n_b")) - 1.0))
    val sp = sqrt(((dd(col("n_a")) - 1.0) * varA +
      (dd(col("n_b")) - 1.0) * varB) /
      (dd(col("n_a")) + dd(col("n_b")) - 2.0))
    val j = lit(1.0) - lit(3.0) /
      (lit(4.0) * (dd(col("n_a")) + dd(col("n_b"))) - 9.0)
    val dEff = (meanB - meanA) / sp
    val degenerate = col("n_a") < 2L || col("n_b") < 2L
    agg.select(col("grp"), col("n_a"), col("n_b"),
      round(when(col("n_a") === 0L, 0.0).otherwise(meanA), 6).as("mean_a"),
      round(when(col("n_b") === 0L, 0.0).otherwise(meanB), 6).as("mean_b"),
      round(when(degenerate, 0.0).otherwise(
        when(sp === 0.0, 0.0).otherwise(dEff)), 6).as("d"),
      round(when(degenerate, 0.0).otherwise(
        when(sp === 0.0, 0.0).otherwise(j * dEff)), 6).as("g"))
  }

  /** Gwet's AC1 chance-corrected agreement per group — the paradox-
    * resistant sibling of [[cohenKappa]] (κ collapses toward 0 on
    * skewed-prevalence panels even when raters agree almost always;
    * AC1's chance term uses the probability of agreeing on a category
    * BY CHANCE weighted by how un-prevalent it is):
    * pe_γ = Σ_c π_c(1−π_c)/(K−1) with π_c the two raters' pooled
    * marginal, AC1 = (po − pe_γ)/(1 − pe_γ).
    *
    * Exactness: with m_c the pooled category count, the chance sum is
    * the EXACT long Σ m_c(2N − m_c); po, pe_γ = that/(4N²(K−1)), and
    * AC1 are fixed-shape doubles over exact longs, 6dp. A single-
    * category panel (K = 1 — chance term undefined) reports 0.
    *
    * Scale shape: the [[cohenKappa]] shape — one labels²-bounded cell
    * shuffle, then category-sized rollups.
    *
    * @param labels rows with `groupCol`, `aCol`, `bCol`
    * @return (grp, n, k_cat, po, pe_gamma, ac1) — 6dp */
  def gwetAC1(labels: DataFrame, groupCol: String = "group",
      aCol: String = "label_a", bCol: String = "label_b"): DataFrame = {
    val cells = labels.select(col(groupCol).as("grp"),
        col(aCol).as("la"), col(bCol).as("lb"))
      .groupBy("grp", "la", "lb").agg(count(lit(1)).as("c"))
      .localCheckpoint() // labels²-bounded; read 3× below
    val n = cells.groupBy("grp").agg(sum(col("c")).as("n"))
    val agree = cells.filter(col("la") === col("lb"))
      .groupBy("grp").agg(sum(col("c")).as("agree"))
    // pooled category marginals m_c = count(la=c) + count(lb=c)
    val marg = cells.select(col("grp"), col("la").as("cat"), col("c"))
      .unionAll(cells.select(col("grp"), col("lb").as("cat"), col("c")))
      .groupBy("grp", "cat").agg(sum(col("c")).as("m"))
    val chance = marg.join(n, Seq("grp"))
      .groupBy("grp").agg(
        countDistinct(col("cat")).as("k_cat"),
        sum(col("m") * (lit(2L) * col("n") - col("m"))).as("chance_num"))
    def dd(c: Column) = c.cast(DoubleType)
    val po = dd(coalesce(col("agree"), lit(0L))) / dd(col("n"))
    val pe = dd(col("chance_num")) /
      (lit(4.0) * dd(col("n")) * dd(col("n")) * (dd(col("k_cat")) - 1.0))
    val out = n.join(agree, Seq("grp"), "left").join(chance, Seq("grp"))
      .select(col("grp"), col("n"), col("k_cat"),
        round(po, 6).as("po"),
        round(when(col("k_cat") <= 1L, 0.0).otherwise(pe), 6).as("pe_gamma"),
        round(when(col("k_cat") <= 1L, 0.0).otherwise(
          when(pe === 1.0, 0.0).otherwise((po - pe) / (lit(1.0) - pe))), 6)
          .as("ac1"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells)
    out
  }

  /** Rank-biased overlap (truncated) per group between two scored
    * rankings — the top-weighted list-similarity for comparing
    * rankers (does the quality ranking agree with the length ranking
    * where it MATTERS, at the top?): with X_d the overlap of the two
    * top-d prefixes, RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·X_d/d — depth-d
    * agreement discounted geometrically (Webber et al. 2010's RBO_min
    * at truncation depth k, the conservative published form).
    *
    * Determinism: both rankings order by (score DESC, item ASC) — the
    * item tie-break pins ranks exactly; the geometric weights are
    * COMPILED-IN double literals, so any engine replaying this
    * formula uses bit-identical constants; each depth's term is a
    * NANO long pre-sum (exact cumulative X_d from a window), and the
    * published rbo is one multiply + 6dp.
    *
    * Scale shape: two top-k-per-group rank windows (score-sorted,
    * k-bounded output), one k-bounded join, k-bounded depth windows —
    * after the rank windows nothing is corpus-proportional. The rank
    * window is the corpus-touching step and is the same
    * WindowGroupLimit-able top-k shape as q_window_top1.
    *
    * @param a,b rows with `groupCol`, `itemCol`, `scoreCol` (long)
    * @return (grp, k, overlap_k, rbo) — rbo 6dp */
  def rboOverlap(a: DataFrame, b: DataFrame, k: Int = 20,
      p: Double = 0.9, groupCol: String = "group",
      itemCol: String = "item", scoreCol: String = "score_micro")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, rnk: String) = df
      .select(col(groupCol).as("grp"), col(itemCol).as("item"),
        col(scoreCol).cast(LongType).as("s"))
      .withColumn(rnk, row_number().over(Window.partitionBy("grp")
        .orderBy(col("s").desc, col("item"))))
      .filter(col(rnk) <= k).drop("s")
    val ra = ranked(a, "ra"); val rb = ranked(b, "rb")
    val joined = ra.join(rb, Seq("grp", "item"))
      .select(col("grp"), greatest(col("ra"), col("rb")).as("d"))
      .groupBy("grp", "d").agg(count(lit(1)).as("enter"))
    // depth scaffold from EITHER ranking's groups: a group whose two
    // top-k lists share nothing still reports rbo = 0, not no-row
    val depths = ra.select(col("grp")).unionAll(rb.select(col("grp")))
      .distinct()
      .select(col("grp"), explode(sequence(lit(1), lit(k))).as("d"))
      .join(joined, Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("enter"), lit(0L)).as("enter"))
    val wCum = Window.partitionBy("grp").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    // p^{d-1} as compiled-in literals: both engines replay the exact
    // same doubles (no cross-engine pow())
    val pows = array((0 until k).map(i => lit(math.pow(p, i))): _*)
    val terms = depths.withColumn("xd", sum(col("enter")).over(wCum))
      .withColumn("term_nano", round(element_at(pows, col("d")) *
        col("xd").cast(DoubleType) / col("d").cast(DoubleType) * 1e9, 0)
        .cast(LongType))
    terms.groupBy("grp").agg(
        max(when(col("d") === k, col("xd"))).as("overlap_k"),
        sum(col("term_nano")).as("s_nano"))
      .select(col("grp"), lit(k).as("k"), col("overlap_k"),
        round(col("s_nano").cast(DoubleType) / 1e9 * (1.0 - p), 6).as("rbo"))
  }

  /** Trimmed + winsorized mean per group — the robust location pair
    * for heavy-tailed metrics (one whale order must not own the
    * dashboard): with g = ⌊N·α⌋ cut from EACH side, the trimmed mean
    * drops those rows and the winsorized mean clamps them to the
    * surviving extremes (rank g+1 and rank N−g values).
    *
    * Exactness: per-value counts, cumulative ranks, clipped weights,
    * and both numerators are EXACT longs (the order statistics come
    * from the cumulative count window, not a sort-and-index); each
    * mean is one division, 6dp, in the caller's integer scale.
    * Groups where the trim swallows everything (N ≤ 2g) report 0.
    *
    * Scale shape: one (group, value) count shuffle map-side combined,
    * then value-cardinality-bounded windows — the [[aucRoc]] shape;
    * never a corpus-wide sort.
    *
    * @param df rows with `groupCol`, `vCol` (long, caller-scaled)
    * @param trimMicro per-side trim fraction in micros (50000 = 5%)
    * @return (grp, n, trim_n, trimmed_mean, winsor_mean) — 6dp */
  def robustLocation(df: DataFrame, groupCol: String = "group",
      vCol: String = "v", trimMicro: Long = 50000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(groupCol).as("grp"),
        col(vCol).cast(LongType).as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val wAll = Window.partitionBy("grp")
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = cells
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cumPrev", col("cum") - col("c"))
      // ⌊N·α⌋ in pure integer arithmetic (div, not a double round-trip)
      .withColumn("lo", expr(s"(n * ${trimMicro}L) div 1000000"))
    val w = greatest(lit(0L), least(col("cum"), col("n") - col("lo")) -
      greatest(col("cumPrev"), col("lo")))
    val agg = ranked.groupBy("grp").agg(
      max(col("n")).as("n"), max(col("lo")).as("lo"),
      sum(w * col("v")).as("mid_sum"),
      // order statistics from the cumulative ranks: value at rank
      // lo+1 (lower winsor clamp) and at rank N−lo (upper clamp)
      min(when(col("cum") >= col("lo") + 1L, col("v"))).as("v_lo"),
      min(when(col("cum") >= col("n") - col("lo"), col("v"))).as("v_hi"))
    def dd(c: Column) = c.cast(DoubleType)
    val trimN = col("n") - lit(2L) * col("lo")
    agg.select(col("grp"), col("n"), col("lo").as("trim_n"),
      round(when(trimN <= 0L, 0.0)
        .otherwise(dd(col("mid_sum")) / dd(trimN)), 6).as("trimmed_mean"),
      round(when(trimN <= 0L, 0.0)
        .otherwise(dd(col("mid_sum") + col("lo") * col("v_lo") +
          col("lo") * col("v_hi")) / dd(col("n"))), 6).as("winsor_mean"))
  }

  /** Murphy's decomposition of the Brier score over the calibration
    * bins — WHY is the score what it is: reliability
    * REL = (1/N)·Σ n_b(f_b − o_b)² (miscalibration — fixable by
    * remapping scores), resolution RES = (1/N)·Σ n_b(o_b − ō)²
    * (discrimination — only a better model buys more), and
    * uncertainty UNC = ō(1−ō) (the base rate's floor). Uses the SAME
    * binned accumulator as [[calibration]] — one state table
    * ([[calibrationState]], streamed by
    * [[graft.streaming.StreamingOps.calibrationStateStream]]), a
    * third finish. f_b is the bin MEAN forecast, so Brier =
    * REL − RES + UNC holds up to the within-bin forecast variance —
    * the report carries the three components, not a reconstruction.
    *
    * Exactness: per-bin n/Σp/Σy are exact longs; each bin's REL and
    * RES terms are NANO longs pre-sum; every published number is a
    * fixed-shape double over exact longs, 6dp.
    *
    * Scale shape: the bins-keyed shuffle of [[calibration]], then
    * bins-sized arithmetic with the totals broadcast back.
    *
    * @return one row: (n, n_bins, o_bar, reliability, resolution,
    *         uncertainty) — 6dp */
  def brierDecomposition(preds: DataFrame, bins: Int = 10,
      pCol: String = "p_micro", yCol: String = "y"): DataFrame =
    brierDecompositionFinish(calibrationState(preds, bins, pCol, yCol))

  /** Finish a [[calibrationState]] snapshot into the decomposition —
    * bins-sized input, batch ≡ merged micro-batches. */
  def brierDecompositionFinish(state: DataFrame): DataFrame = {
    val st = state.localCheckpoint() // bins-sized; totals + terms
    val totals = st.agg(sum(col("n_bin")).as("n"), sum(col("pos")).as("p"),
      count(lit(1)).as("n_bins"))
    def dd(c: Column) = c.cast(DoubleType)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val f = dd(col("sum_p")) / (dd(col("n_bin")) * 1e6)
    val o = dd(col("pos")) / dd(col("n_bin"))
    val oBar = dd(col("p")) / dd(col("n"))
    val terms = st.crossJoin(broadcast(totals)).select(
      col("n"), col("p"), col("n_bins"),
      nano(dd(col("n_bin")) * (f - o) * (f - o)).as("rel_nano"),
      nano(dd(col("n_bin")) * (o - oBar) * (o - oBar)).as("res_nano"))
    val out = terms.groupBy("n", "p", "n_bins").agg(
        sum(col("rel_nano")).as("sr"), sum(col("res_nano")).as("ss"))
      .select(col("n"), col("n_bins"),
        round(dd(col("p")) / dd(col("n")), 6).as("o_bar"),
        round(dd(col("sr")) / 1e9 / dd(col("n")), 6).as("reliability"),
        round(dd(col("ss")) / 1e9 / dd(col("n")), 6).as("resolution"),
        round(dd(col("p")) / dd(col("n")) *
          (lit(1.0) - dd(col("p")) / dd(col("n"))), 6).as("uncertainty"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(st)
    out
  }

  /** Hill tail-index estimator per group — HOW heavy is the heavy
    * tail that [[robustLocation]] defends against? Over the k
    * largest positive values, α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1));
    * α̂ ≤ 2 means infinite variance (whales dominate any mean), and
    * a Pareto/Zipf corpus reads its shape parameter directly — the
    * numeric-distribution twin of the rank-frequency zipf-slope.
    *
    * Exactness: the top-k membership and per-value weights come from
    * the descending cumulative count window (exact longs — order
    * statistics without a sort, the [[robustLocation]] discipline);
    * each value's ln(v/x_ref) rounds to a NANO long, multiplies by
    * its integer weight, and sums exactly; α̂ is one division, 6dp.
    * Groups with fewer than 2 positive values, k_used = 0, or a zero
    * log-sum report alpha = 0.
    *
    * Scale shape: one (group, value) count shuffle map-side combined,
    * then value-cardinality-bounded windows and a groups-sized
    * broadcast join of the reference values.
    *
    * @param df rows with `groupCol`, `vCol` (long, caller-scaled;
    *           only v > 0 participates — log scale)
    * @return (grp, k_used, x_ref, alpha) — alpha 6dp */
  def hillTail(df: DataFrame, k: Int = 100, groupCol: String = "group",
      vCol: String = "v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(groupCol).as("grp"),
        col(vCol).cast(LongType).as("v"))
      .filter(col("v") > 0L)
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("grp").orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = cells
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cumPrev", col("cum") - col("c"))
      .localCheckpoint() // feeds the ref lookup AND the term sum
    val ref = ranked.groupBy("grp").agg(
      max(when(col("cum") >= k + 1L, col("v"))).as("x_ref"),
      sum(col("c")).as("n_pos"))
    def dd(c: Column) = c.cast(DoubleType)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val terms = ranked.join(broadcast(ref), Seq("grp"))
      .filter(col("x_ref").isNotNull && col("cumPrev") < k)
      .select(col("grp"),
        (greatest(lit(0L), least(col("cum"), lit(k.toLong)) - col("cumPrev")) *
          nano(log(dd(col("v")) / dd(col("x_ref"))))).as("t_nano"),
        greatest(lit(0L), least(col("cum"), lit(k.toLong)) - col("cumPrev"))
          .as("w"))
    val agg = terms.groupBy("grp").agg(
      sum(col("w")).as("k_used"), sum(col("t_nano")).as("s_nano"))
    val out = ref.join(agg, Seq("grp"), "left")
      .select(col("grp"),
        coalesce(col("k_used"), lit(0L)).as("k_used"), col("x_ref"),
        round(when(col("x_ref").isNull || coalesce(col("k_used"), lit(0L)) === 0L
            || coalesce(col("s_nano"), lit(0L)) <= 0L, 0.0)
          .otherwise(dd(col("k_used")) /
            (dd(col("s_nano")) / 1e9)), 6).as("alpha"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(ranked)
    out
  }

  /** Mann–Whitney U rank-sum test per group — the NONPARAMETRIC
    * two-sample comparison (does arm b's metric stochastically
    * dominate arm a's?) that [[abTest]]'s proportion z-test cannot
    * express for continuous metrics, and the unpaired sibling of
    * [[delongTest]] (which owns the correlated same-items case).
    * U_b = Σ_v n_b(v)·(n_a_below(v) + n_a(v)/2) over distinct metric
    * values v (exact mid-rank tie handling, same identity as
    * [[aucRoc]]); z normalizes U_b against its null mean n_a·n_b/2
    * and tie-corrected variance
    * (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))).
    *
    * Exactness: u2 = 2·U_b and the tie term Σ(t³−t) are exact long
    * sums (u2 < 2⁶³ through ~3·10⁹ rows/group; t³ through ~2·10⁶
    * ties on one value); z is a fixed-shape IEEE expression over
    * those longs, 6dp. A group with an empty arm, or zero variance
    * (every value tied), reports z = 0.
    *
    * Scale shape: one (group, value) count shuffle map-side combined,
    * then EVERYTHING is value-cardinality-bounded — the cumulative
    * window partitions by group over the distinct-value table, never
    * corpus-proportional (the [[aucRoc]] argument).
    *
    * @param df rows with `groupCol`, `armCol` (0 = a, else b) and
    *           `vCol` (long micro metric)
    * @return (grp, n_a, n_b, u2, z) — z 6dp */
  def mannWhitney(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v_micro"): DataFrame =
    mannWhitneyFinish(mannWhitneyState(df, groupCol, armCol, vCol))

  /** The ALGEBRAIC (grp, value) accumulator (n_a, n_b) — two
    * commutative long sums, so micro-batches fold freely and the
    * state is value-cardinality-bounded forever (the streaming-twin
    * state table, [[graft.streaming.StreamingOps.mannWhitneyStateStream]]). */
  private[graft] def mannWhitneyState(df: DataFrame,
      groupCol: String = "group", armCol: String = "arm",
      vCol: String = "v_micro"): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(armCol).cast(LongType).as("arm"),
        col(vCol).cast(LongType).as("v"))
      .groupBy("grp", "v").agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na_v"),
        sum(when(col("arm") =!= 0L, 1L).otherwise(0L)).as("nb_v"))

  /** The shared rank-sum rollup over a [[mannWhitneyState]] snapshot:
    * (grp, n_a, n_b, u2, tie3) exact longs — one cumulative window +
    * one agg, consumed by BOTH [[mannWhitneyFinish]] (the z test) and
    * [[cliffsDeltaFinish]] (the effect size). */
  private def mwAgg(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBelow = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = state.withColumn("aBelow",
      coalesce(sum(col("na_v")).over(wBelow), lit(0L)))
    terms.groupBy("grp").agg(
      sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"),
      sum(col("nb_v") * (lit(2L) * col("aBelow") + col("na_v"))).as("u2"),
      sum((col("na_v") + col("nb_v")) * (col("na_v") + col("nb_v")) *
        (col("na_v") + col("nb_v")) - (col("na_v") + col("nb_v")))
        .as("tie3"))
  }

  /** Finish a [[mannWhitneyState]] snapshot into the z report —
    * state-sized input, identical whether cells came from one batch
    * pass or merged micro-batches. */
  def mannWhitneyFinish(state: DataFrame): DataFrame = {
    val agg = mwAgg(state)
    val nA = col("n_a").cast(DoubleType); val nB = col("n_b").cast(DoubleType)
    val nn = nA + nB
    val varU = nA * nB / 12.0 * ((nn + 1.0) -
      col("tie3").cast(DoubleType) / (nn * (nn - 1.0)))
    agg.select(col("grp"), col("n_a"), col("n_b"), col("u2"),
      round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
        .otherwise(when(varU <= 0.0, 0.0).otherwise(
          (col("u2").cast(DoubleType) - nA * nB) /
            (lit(2.0) * sqrt(varU)))), 6).as("z"))
  }

  /** Cliff's delta ordinal effect size per group — HOW OFTEN does arm
    * b's metric beat arm a's (δ = P(b > a) − P(a > b) ∈ [−1, 1])?
    * The magnitude companion of [[mannWhitney]]'s significance z (a
    * huge sample makes a trivial shift "significant"; δ says whether
    * anyone should care), derived from the SAME state table and the
    * same rank rollup: δ = u2/(n_a·n_b) − 1 exactly (mid-rank ties
    * cancel in pairs). Banded by the Romano et al. (2006) thresholds
    * on the published 6dp value: negligible < 0.147 ≤ small < 0.33 ≤
    * medium < 0.474 ≤ large.
    *
    * @param df rows as [[mannWhitney]]
    * @return (grp, n_a, n_b, u2, delta, magnitude) — delta 6dp */
  def cliffsDelta(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v_micro"): DataFrame =
    cliffsDeltaFinish(mannWhitneyState(df, groupCol, armCol, vCol))

  /** Finish a [[mannWhitneyState]] snapshot into the effect-size
    * report — one streamed state, a second metric (the
    * [[prAucFinish]]-off-[[aucRoc]] discipline). */
  def cliffsDeltaFinish(state: DataFrame): DataFrame = {
    val agg = mwAgg(state)
    def dd(c: String) = col(c).cast(DoubleType)
    val delta = round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
      .otherwise(dd("u2") / (dd("n_a") * dd("n_b")) - 1.0), 6)
    agg.select(col("grp"), col("n_a"), col("n_b"), col("u2"),
      delta.as("delta"),
      when(col("n_a") === 0L || col("n_b") === 0L, "none")
        .when(abs(delta) < 0.147, "negligible")
        .when(abs(delta) < 0.33, "small")
        .when(abs(delta) < 0.474, "medium")
        .otherwise("large").as("magnitude"))
  }

  /** Hosmer–Lemeshow goodness-of-fit over the calibration bins — the
    * χ²-shaped SIGNIFICANCE companion of [[calibration]]'s ECE and
    * [[brierDecomposition]]'s reliability term (ECE says how big the
    * miscalibration is; HL says whether it exceeds chance at this
    * sample size): HL = Σ_b (O_b − E_b)² / (E_b·(1 − E_b/n_b)) with
    * E_b = Σp/10⁶, df = usable bins − 2. A FOURTH finish over the one
    * [[calibrationState]] accumulator (streamed by
    * calibrationStateStream) — no new pass over predictions.
    *
    * Exactness: O/n are exact longs and E derives from the exact Σp;
    * each bin's term is a NANO long pre-sum (terms are O(n_bin) — the
    * nano long holds through ~10⁹-row bins); bins with a degenerate
    * denominator (E = 0 or E = n) are excluded and visible via
    * bins_used. One division publishes HL, 6dp.
    *
    * @return one row: (n, n_bins, bins_used, hl, df) */
  def hosmerLemeshow(preds: DataFrame, bins: Int = 10,
      pCol: String = "p_micro", yCol: String = "y"): DataFrame =
    hosmerLemeshowFinish(calibrationState(preds, bins, pCol, yCol))

  /** Finish a [[calibrationState]] snapshot into the HL report —
    * bins-sized input, batch ≡ merged micro-batches. */
  def hosmerLemeshowFinish(state: DataFrame): DataFrame = {
    def dd(c: Column) = c.cast(DoubleType)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val e = dd(col("sum_p")) / 1e6
    val denom = e * (lit(1.0) - e / dd(col("n_bin")))
    val terms = state.select(col("n_bin"),
      when(denom <= 0.0, 0L).otherwise(
        nano((dd(col("pos")) - e) * (dd(col("pos")) - e) / denom))
        .as("t_nano"),
      when(denom <= 0.0, 0L).otherwise(1L).as("used"))
    terms.agg(sum(col("n_bin")).as("n"), count(lit(1)).as("n_bins"),
        sum(col("used")).as("bins_used"), sum(col("t_nano")).as("hl_nano"))
      .select(col("n"), col("n_bins"), col("bins_used"),
        round(dd(col("hl_nano")) / 1e9, 6).as("hl"),
        greatest(col("bins_used") - 2L, lit(0L)).as("df"))
  }

  /** Benjamini–Hochberg step-up FDR adjustment per family — the
    * multiple-comparisons gate a dashboard of per-segment tests
    * ([[abTest]] / [[chiSquare]] fan-outs) needs before acting on
    * "significant" cells: adjusted p = min_{j ≥ rank}(p_(j)·m/j),
    * reject ⟺ p_adj ≤ q. Ties in p break by test name, so ranks —
    * and therefore the whole report — are deterministic.
    *
    * Exactness: p_micro·m is an exact long; each raw adjusted value
    * is one fixed-shape division rounded to 9dp BEFORE the running
    * min (cummin over already-rounded values is order-prescribed by
    * the window — bit-stable in any engine); published p_adj 6dp.
    *
    * Scale shape: the input is one row per TEST (a families×tests
    * table, never corpus rows); both windows partition by family over
    * that bounded table.
    *
    * @param tests rows with `groupCol` (family), `testCol`,
    *              `pCol` (long micro p-value, 0..1e6)
    * @return (grp, test, p_micro, rnk, m, p_adj, reject) */
  def bhAdjust(tests: DataFrame, q: Double = 0.05,
      groupCol: String = "group", testCol: String = "test",
      pCol: String = "p_micro"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = tests.select(col(groupCol).as("grp"),
      col(testCol).as("test"), col(pCol).cast(LongType).as("p_micro"))
    val wRank = Window.partitionBy("grp").orderBy("p_micro", "test")
    val wM = Window.partitionBy("grp")
    val wMin = Window.partitionBy("grp")
      .orderBy(col("p_micro").desc, col("test").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wM))
      .withColumn("raw", round(
        (col("p_micro") * col("m")).cast(DoubleType) /
          (lit(1e6) * col("rnk").cast(DoubleType)), 9))
      .withColumn("p_adj", round(least(lit(1.0), min(col("raw")).over(wMin)), 6))
      .select(col("grp"), col("test"), col("p_micro"),
        col("rnk").cast(LongType).as("rnk"), col("m"),
        col("p_adj"), (col("p_adj") <= q).as("reject"))
  }

  /** Mantel–Haenszel stratified 2×2 analysis per group: the common
    * odds ratio OR_MH = Σ(a·d/n) / Σ(b·c/n) and the continuity-
    * corrected Cochran–Mantel–Haenszel χ² — the confounding-safe
    * readout when an exposure/outcome table is Simpson-prone
    * (pooled [[abTest]] counts flip sign under a lurking stratum).
    * Cells per stratum: a=(arm1,y1) b=(arm1,y0) c=(arm0,y1)
    * d=(arm0,y0); E[a] = row1·col1/n,
    * Var[a] = row1·row0·col1·col0/(n²(n−1)).
    *
    * Exactness: cell counts are exact longs; each stratum's R=a·d/n,
    * S=b·c/n, E and Var terms are single divisions rounded to NANO
    * longs pre-sum (terms ≤ n ≤ 10⁶ rows/stratum keep nano longs
    * < 2⁶³ through ~10⁹ strata-rows), the cross-strata sums are
    * exact, and OR_MH / χ² are fixed-shape doubles over them, 6dp.
    * Strata with n < 2 carry no Var and are excluded wholesale (the
    * standard estimator's convention); groups with ΣS = 0 or
    * ΣVar = 0 report or_mh = 0 / chi2 = 0.
    *
    * Scale shape: ONE corpus aggregation map-side combined to
    * (group × stratum) cells, then a groups-sized rollup.
    *
    * @param df rows with `groupCol`, `stratumCol`, `armCol` (0/1),
    *           `yCol` (0/1)
    * @return (grp, n_strata, sum_a, or_mh, chi2) — 6dp */
  def mantelHaenszel(df: DataFrame, groupCol: String = "group",
      stratumCol: String = "stratum", armCol: String = "arm",
      yCol: String = "y"): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"),
        col(stratumCol).as("stratum"),
        col(armCol).cast(LongType).as("arm"), col(yCol).cast(LongType).as("y"))
      .groupBy("grp", "stratum").agg(
        sum(col("arm") * col("y")).as("a"),
        sum(col("arm") * (lit(1L) - col("y"))).as("b"),
        sum((lit(1L) - col("arm")) * col("y")).as("c"),
        sum((lit(1L) - col("arm")) * (lit(1L) - col("y"))).as("d"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2L)
    def dd(c: Column) = c.cast(DoubleType)
    val n = dd(col("n"))
    val row1 = dd(col("a") + col("b")); val row0 = dd(col("c") + col("d"))
    val col1 = dd(col("a") + col("c")); val col0 = dd(col("b") + col("d"))
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val terms = cells.select(col("grp"), col("a"),
      nano(dd(col("a")) * dd(col("d")) / n).as("r_nano"),
      nano(dd(col("b")) * dd(col("c")) / n).as("s_nano"),
      nano(row1 * col1 / n).as("e_nano"),
      nano(row1 * row0 * col1 * col0 / (n * n * (n - 1.0))).as("v_nano"))
    val agg = terms.groupBy("grp").agg(count(lit(1)).as("n_strata"),
      sum(col("a")).as("sum_a"), sum(col("r_nano")).as("sum_r"),
      sum(col("s_nano")).as("sum_s"), sum(col("e_nano")).as("sum_e"),
      sum(col("v_nano")).as("sum_v"))
    val dev = abs(dd(col("sum_a")) - dd(col("sum_e")) / 1e9) - 0.5
    agg.select(col("grp"), col("n_strata"), col("sum_a"),
      round(when(col("sum_s") === 0L, 0.0)
        .otherwise(dd(col("sum_r")) / dd(col("sum_s"))), 6).as("or_mh"),
      round(when(col("sum_v") === 0L, 0.0)
        .otherwise(greatest(dev, lit(0.0)) * greatest(dev, lit(0.0)) /
          (dd(col("sum_v")) / 1e9)), 6).as("chi2"))
  }

  /** Jensen–Shannon divergence per group between two sides' token
    * (or any categorical) distributions — the SYMMETRIC, always-
    * finite corpus-drift statistic ([[psi]] needs binned numerics
    * and explodes on empty bins; KL is asymmetric and infinite on
    * novel tokens): JS = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q)),
    * bounded by ln 2.
    *
    * Exactness: side totals and per-token counts are exact longs;
    * each token's two ln-terms are rounded to NANO longs pre-sum
    * (the repo's ln discipline — both engines' ln agree far beyond
    * 9dp on these magnitudes), cross-vocab sums are exact, and the
    * published js_nats / js_bits are fixed-shape doubles, 6dp.
    * A group with an empty side reports 0 (no distribution to
    * compare).
    *
    * Scale shape: one (group, token) count shuffle map-side combined
    * to vocab-sized cells, a groups-sized totals rollup broadcast
    * back, then one vocab-sized term sum — never corpus-proportional
    * after the first shuffle.
    *
    * @param df rows with `groupCol`, `sideCol` (0 = p-side, else q),
    *           `tokCol`
    * @return (grp, n_a, n_b, vocab, js_nats, js_bits) — 6dp */
  def jsDivergence(df: DataFrame, groupCol: String = "group",
      sideCol: String = "side", tokCol: String = "tok"): DataFrame =
    jsFinish(jsState(df, groupCol, sideCol, tokCol))

  /** The ALGEBRAIC (grp, token) accumulator (ca, cb) — two
    * commutative long sums per vocab cell, so micro-batches fold
    * freely and the state is vocab-bounded forever (the streaming-
    * twin state table,
    * [[graft.streaming.StreamingOps.jsStateStream]]). */
  private[graft] def jsState(df: DataFrame, groupCol: String = "group",
      sideCol: String = "side", tokCol: String = "tok"): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(sideCol).cast(LongType).as("side"), col(tokCol).as("tok"))
      .groupBy("grp", "tok").agg(
        sum(when(col("side") === 0L, 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") =!= 0L, 1L).otherwise(0L)).as("cb"))

  /** Finish a [[jsState]] snapshot into the divergence report —
    * state-sized input, batch ≡ merged micro-batches. */
  def jsFinish(state: DataFrame): DataFrame = {
    val cells = state
      .localCheckpoint() // feeds totals AND terms; released below
    val totals = cells.groupBy("grp").agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      count(lit(1)).as("vocab"))
    val joined = cells.join(broadcast(totals), Seq("grp"))
    val p = col("ca").cast(DoubleType) / col("n_a").cast(DoubleType)
    val q = col("cb").cast(DoubleType) / col("n_b").cast(DoubleType)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val terms = joined.select(col("grp"),
      when(col("ca") === 0L || col("n_a") === 0L, 0L)
        .otherwise(nano(p * log(lit(2.0) * p / (p + q)))).as("tp_nano"),
      when(col("cb") === 0L || col("n_b") === 0L, 0L)
        .otherwise(nano(q * log(lit(2.0) * q / (p + q)))).as("tq_nano"))
    val agg = terms.groupBy("grp").agg(
      sum(col("tp_nano")).as("sp"), sum(col("tq_nano")).as("sq"))
    val out = totals.join(agg, Seq("grp"))
      .select(col("grp"), col("n_a"), col("n_b"), col("vocab"),
        round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
          .otherwise((col("sp") + col("sq")).cast(DoubleType) / 2e9), 6)
          .as("js_nats"),
        round(when(col("n_a") === 0L || col("n_b") === 0L, 0.0)
          .otherwise((col("sp") + col("sq")).cast(DoubleType) / 2e9 /
            math.log(2.0)), 6).as("js_bits"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells)
    out
  }

  /** Kaplan–Meier product-limit survival estimator per group — the
    * censoring-aware retention/lifetime curve (naive "fraction still
    * alive at t" is biased the moment observation windows differ):
    * at each distinct event time t, S(t) = Π_{t'≤t} (1 − d_{t'} /
    * n_risk(t')), with censored subjects leaving the risk set at
    * their censoring time without contributing an event.
    *
    * Exactness: (d, c) per (group, t) and the risk-set cumulative
    * are exact longs; each factor's ln(1 − d/n) is rounded to a NANO
    * long pre-sum, the cumulative sum is exact (window-ordered), and
    * the published survival is one exp + 6dp round. A time where the
    * whole risk set dies (d = n_risk) pins S to 0 from there on
    * (ln is undefined; the flag-based zero is the estimator's own
    * value). Rows are emitted at EVENT times only (d > 0), the
    * standard KM step points.
    *
    * Scale shape: one (group, t) count shuffle map-side combined,
    * then distinct-time-bounded windows per group (durations arrive
    * pre-bucketed — days/months — exactly like [[calibration]]'s
    * bins); never corpus-proportional after the first shuffle.
    *
    * @param df one row per subject: `groupCol`, `tCol` (long
    *           duration bucket), `eventCol` (1 = event, 0 = censored)
    * @return (grp, t, n_risk, d, c, surv) — surv 6dp */
  def kaplanMeier(df: DataFrame, groupCol: String = "group",
      tCol: String = "t", eventCol: String = "event"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val state = df.select(col(groupCol).as("grp"),
        col(tCol).cast(LongType).as("t"),
        col(eventCol).cast(LongType).as("event"))
      .groupBy("grp", "t").agg(
        sum(col("event")).as("d"),
        (count(lit(1)) - sum(col("event"))).as("c"))
    val wAll = Window.partitionBy("grp")
    val wPrev = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val risked = state
      .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("term_nano", when(col("d") === 0L, 0L)
        .when(col("d") >= col("n_risk"), 0L) // zero-surv handled by flag
        .otherwise(nano(log(lit(1.0) - col("d").cast(DoubleType) /
          col("n_risk").cast(DoubleType)))))
      .withColumn("died_out",
        sum(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("cum_nano", sum(col("term_nano")).over(wCum))
    risked.filter(col("d") > 0L)
      .select(col("grp"), col("t"), col("n_risk"), col("d"), col("c"),
        round(when(col("died_out") > 0L, 0.0)
          .otherwise(exp(col("cum_nano").cast(DoubleType) / 1e9)), 6)
          .as("surv"))
  }

  /** Nelson–Aalen cumulative-hazard estimator per group — the
    * additive sibling of [[kaplanMeier]] on the same censored
    * lifetimes: H(t) = Σ_{t'≤t} d_{t'}/n_risk(t') with variance
    * Σ d/n², and the Fleming–Harrington survival exp(−H(t)) (the
    * small-risk-set-robust alternative to the KM product — KM pins
    * to 0 the moment one risk set dies out; NA keeps estimating).
    *
    * Exactness: (d, c) and the risk-set cumulative are exact longs;
    * each hazard/variance increment is rounded to a NANO long
    * pre-sum so the group cumulative is an exact window sum; the
    * published columns are one division / one exp, 6dp. Emitted at
    * event times only (d > 0), like KM.
    *
    * Scale shape: identical to [[kaplanMeier]] — one (group, t)
    * count shuffle map-side combined, then distinct-time-bounded
    * windows per group.
    *
    * @param df one row per subject: `groupCol`, `tCol` (long
    *           duration bucket), `eventCol` (1 = event, 0 = censored)
    * @return (grp, t, n_risk, d, c, cum_haz, var_haz, fh_surv) — 6dp */
  def nelsonAalen(df: DataFrame, groupCol: String = "group",
      tCol: String = "t", eventCol: String = "event"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val state = df.select(col(groupCol).as("grp"),
        col(tCol).cast(LongType).as("t"),
        col(eventCol).cast(LongType).as("event"))
      .groupBy("grp", "t").agg(
        sum(col("event")).as("d"),
        (count(lit(1)) - sum(col("event"))).as("c"))
    val wAll = Window.partitionBy("grp")
    val wPrev = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("grp").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val nRisk = col("n_risk").cast(DoubleType)
    val risked = state
      .withColumn("n_risk", sum(col("d") + col("c")).over(wAll) -
        coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("h_nano", when(col("d") === 0L, 0L)
        .otherwise(nano(col("d").cast(DoubleType) / nRisk)))
      .withColumn("v_nano", when(col("d") === 0L, 0L)
        .otherwise(nano(col("d").cast(DoubleType) / (nRisk * nRisk))))
      .withColumn("cum_h", sum(col("h_nano")).over(wCum))
      .withColumn("cum_v", sum(col("v_nano")).over(wCum))
    risked.filter(col("d") > 0L)
      .select(col("grp"), col("t"), col("n_risk"), col("d"), col("c"),
        round(col("cum_h").cast(DoubleType) / 1e9, 6).as("cum_haz"),
        round(col("cum_v").cast(DoubleType) / 1e9, 6).as("var_haz"),
        round(exp(-col("cum_h").cast(DoubleType) / 1e9), 6).as("fh_surv"))
  }

  /** Welch's unequal-variance t-test per group — the two-sample MEAN
    * comparison [[abTest]]'s proportion z cannot express and
    * [[mannWhitney]]'s rank test deliberately avoids (rank tests read
    * stochastic dominance, not the mean difference a revenue metric
    * reports). Welch's form drops the equal-variance assumption the
    * pooled t silently bakes in: t = (ȳ_b − ȳ_a)/√(s²_a/n_a +
    * s²_b/n_b), df via Welch–Satterthwaite.
    *
    * Exactness: per-arm (n, Σy, Σy²) are exact long sums (Σy²
    * overflows past |y| ≈ 3·10⁶ micro on 10⁶-row arms — size the
    * metric's unit accordingly; cents-scale business metrics sit far
    * below); means/variances/t/df are one fixed-shape IEEE expression
    * over those longs, 6dp. An arm with n < 2 or zero pooled
    * standard error reports t = 0, df = 0.
    *
    * Scale shape: ONE map-side-combined (group, arm) shuffle carrying
    * three long sums — nothing value- or corpus-proportional after
    * it. The state is algebraic, so micro-batches fold freely
    * (streaming twin: [[graft.streaming.StreamingOps]]).
    *
    * @param df rows with `groupCol`, `armCol` (0 = a, else b) and
    *           `yCol` (long micro metric)
    * @return (grp, n_a, n_b, mean_a, mean_b, t_stat, df) — 6dp */
  def welchTTest(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", yCol: String = "y"): DataFrame =
    welchFinish(welchState(df, groupCol, armCol, yCol))

  /** The ALGEBRAIC (grp, arm) accumulator (n, Σy, Σy²) — three
    * commutative long sums, the streaming-twin state table. */
  private[graft] def welchState(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", yCol: String = "y"): DataFrame =
    df.select(col(groupCol).as("grp"),
        when(col(armCol).cast(LongType) === 0L, 0L).otherwise(1L).as("arm"),
        col(yCol).cast(LongType).as("y"))
      .groupBy("grp", "arm").agg(count(lit(1)).as("n"),
        sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))

  /** Finish a [[welchState]] snapshot into the t report —
    * state-sized input, batch ≡ merged micro-batches. */
  def welchFinish(state: DataFrame): DataFrame = {
    val agg = state.groupBy("grp").agg(
      sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("s")).otherwise(0L)).as("s_a"),
      sum(when(col("arm") === 0L, col("ss")).otherwise(0L)).as("ss_a"),
      sum(when(col("arm") =!= 0L, col("n")).otherwise(0L)).as("n_b"),
      sum(when(col("arm") =!= 0L, col("s")).otherwise(0L)).as("s_b"),
      sum(when(col("arm") =!= 0L, col("ss")).otherwise(0L)).as("ss_b"))
    def d(c: String) = col(c).cast(DoubleType)
    // sample variance from exact sums: (n·Σy² − (Σy)²) / (n(n−1))
    val varA = (d("n_a") * d("ss_a") - d("s_a") * d("s_a")) /
      (d("n_a") * (d("n_a") - 1.0))
    val varB = (d("n_b") * d("ss_b") - d("s_b") * d("s_b")) /
      (d("n_b") * (d("n_b") - 1.0))
    val sea = varA / d("n_a"); val seb = varB / d("n_b")
    val se2 = sea + seb
    val degenerate = col("n_a") < 2L || col("n_b") < 2L
    agg.select(col("grp"), col("n_a"), col("n_b"),
      round(when(col("n_a") === 0L, 0.0)
        .otherwise(d("s_a") / d("n_a")), 6).as("mean_a"),
      round(when(col("n_b") === 0L, 0.0)
        .otherwise(d("s_b") / d("n_b")), 6).as("mean_b"),
      round(when(degenerate, 0.0).otherwise(when(se2 <= 0.0, 0.0)
        .otherwise((d("s_b") / d("n_b") - d("s_a") / d("n_a")) /
          sqrt(se2))), 6).as("t_stat"),
      round(when(degenerate, 0.0).otherwise(when(se2 <= 0.0, 0.0)
        .otherwise(se2 * se2 / (sea * sea / (d("n_a") - 1.0) +
          seb * seb / (d("n_b") - 1.0)))), 6).as("df"))
  }

  /** Always-valid A/B inference via the normal-mixture mSPRT per
    * group — the PEEKING-SAFE companion to [[welchTTest]]/[[abTest]]:
    * a fixed-horizon t/z test read daily inflates false positives;
    * the mixture sequential probability ratio
    * Λ = √(se²/(se²+τ²))·exp(δ̂²τ²/(2se²(se²+τ²))) admits
    * p = min(1, 1/Λ) valid at EVERY look (Robbins' mixture martingale
    * — the "always-valid p-value" industry A/B platforms ship).
    * Reported as log Λ so extreme evidence cannot overflow; the
    * snapshot p is 1/Λ capped at 1 (a monitoring caller takes the
    * running min across snapshots — each is individually valid).
    *
    * A FINISH over the [[welchState]] (grp, arm) sufficient sums —
    * the shared-state discipline, so it streams via
    * [[graft.streaming.StreamingOps.welchStateStream]] for free.
    * Exactness: the state is exact longs; log Λ and p are one
    * fixed-shape IEEE expression, 6dp. Degenerate (either arm n < 2
    * or se² ≤ 0) reports log Λ = 0, p = 1.
    *
    * @param tau mixture prior scale on the mean difference, in yCol
    *            units — the caller's "effect size worth detecting"
    * @return (grp, n_a, n_b, delta, log_lambda, p_always) — 6dp */
  def msprt(df: DataFrame, tau: Double = 100.0,
      groupCol: String = "group", armCol: String = "arm",
      yCol: String = "y"): DataFrame =
    msprtFinish(welchState(df, groupCol, armCol, yCol), tau)

  /** Finish a [[welchState]] snapshot into the always-valid report —
    * state-sized input, batch ≡ merged micro-batches. */
  def msprtFinish(state: DataFrame, tau: Double): DataFrame = {
    val agg = state.groupBy("grp").agg(
      sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("s")).otherwise(0L)).as("s_a"),
      sum(when(col("arm") === 0L, col("ss")).otherwise(0L)).as("ss_a"),
      sum(when(col("arm") =!= 0L, col("n")).otherwise(0L)).as("n_b"),
      sum(when(col("arm") =!= 0L, col("s")).otherwise(0L)).as("s_b"),
      sum(when(col("arm") =!= 0L, col("ss")).otherwise(0L)).as("ss_b"))
    def d(c: String) = col(c).cast(DoubleType)
    val varA = (d("n_a") * d("ss_a") - d("s_a") * d("s_a")) /
      (d("n_a") * (d("n_a") - 1.0))
    val varB = (d("n_b") * d("ss_b") - d("s_b") * d("s_b")) /
      (d("n_b") * (d("n_b") - 1.0))
    val se2 = varA / d("n_a") + varB / d("n_b")
    val delta = d("s_b") / d("n_b") - d("s_a") / d("n_a")
    val t2 = lit(tau * tau)
    val logLam = lit(0.5) * log(se2 / (se2 + t2)) +
      delta * delta * t2 / (lit(2.0) * se2 * (se2 + t2))
    val degenerate = col("n_a") < 2L || col("n_b") < 2L
    agg.select(col("grp"), col("n_a"), col("n_b"),
      round(when(degenerate, 0.0).otherwise(when(se2 <= 0.0, 0.0)
        .otherwise(delta)), 6).as("delta"),
      round(when(degenerate, 0.0).otherwise(when(se2 <= 0.0, 0.0)
        .otherwise(logLam)), 6).as("log_lambda"),
      round(when(degenerate, 1.0).otherwise(when(se2 <= 0.0, 1.0)
        .otherwise(when(logLam <= 0.0, 1.0)
          .otherwise(exp(-logLam)))), 6).as("p_always"))
  }

  /** Kruskal–Wallis H rank test per group — the k-SAMPLE extension of
    * [[mannWhitney]] (three or more arms; MW handles exactly two):
    * does at least one arm's metric distribution sit above the rest?
    * H = 12/(N(N+1)) · Σ_j n_j(R̄_j − (N+1)/2)² over mid-ranks, with
    * the tie correction H' = H / (1 − Σ(t³−t)/(N³−N)).
    *
    * Exactness: per-(arm, value) counts, the doubled rank sums
    * 2R_j = Σ_v cnt·(2·below + t_v + 1) and the tie masses are exact
    * longs (2R_j < 2⁶³ through ~3·10⁹ rows/group, the [[mannWhitney]]
    * bound); each arm's normalized H term is rounded to a MICRO long
    * pre-sum (terms are O(N) — the micro long holds through ~10¹²-row
    * groups), so the cross-arm fold is exact and order-free; the tie
    * correction is one fixed-shape IEEE expression. A group with
    * k < 2 arms, or every value tied (correction 0), reports 0.
    *
    * Scale shape: one (group, arm, value) count shuffle map-side
    * combined, then EVERYTHING is value-cardinality-bounded — the
    * cumulative window runs over the distinct-value table per group,
    * the arm rollup over (arm × value) cells ([[aucRoc]] argument).
    *
    * @param df rows with `groupCol`, `armCol` (the treatment label,
    *           any type) and `vCol` (long micro metric)
    * @return (grp, k_arms, n, h, h_adj) — 6dp */
  def kruskalWallis(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v"): DataFrame =
    kwFinish(kwState(df, groupCol, armCol, vCol))

  /** The ALGEBRAIC (grp, arm, value) accumulator — one commutative
    * long count per cell, so micro-batches fold freely and the state
    * is (arm × value)-cardinality-bounded forever (the streaming-twin
    * state table, [[graft.streaming.StreamingOps.kruskalStateStream]]). */
  private[graft] def kwState(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v"): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(armCol).cast(StringType).as("arm"),
        col(vCol).cast(LongType).as("v"))
      .groupBy("grp", "arm", "v").agg(count(lit(1)).as("cnt"))

  /** Finish a [[kwState]] snapshot into the H report — state-sized
    * input, batch ≡ merged micro-batches. */
  def kwFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = state
      .localCheckpoint() // feeds the value table AND the arm rollup
    val wPrev = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tv = cells.groupBy("grp", "v").agg(sum(col("cnt")).as("t_v"))
      .withColumn("below", coalesce(sum(col("t_v")).over(wPrev), lit(0L)))
      .localCheckpoint() // feeds the rank join AND the tie rollup
    val perArm = cells.join(tv, Seq("grp", "v"))
      .groupBy("grp", "arm").agg(sum(col("cnt")).as("n_j"),
        sum(col("cnt") * (lit(2L) * col("below") + col("t_v") + 1L))
          .as("r2_j"))
    val ties = tv.groupBy("grp").agg(
      sum(col("t_v") * col("t_v") * col("t_v") - col("t_v")).as("tie3"),
      sum(col("t_v")).as("n_total"))
    def d(c: Column) = c.cast(DoubleType)
    // normalized-per-arm H term, micro-rounded pre-sum (order-free):
    // 12·n_j·(R̄_j − (N+1)/2)² / (N(N+1)), R̄_j = r2_j/(2·n_j)
    val dev = d(col("r2_j")) / (lit(2.0) * d(col("n_j"))) -
      (d(col("n_total")) + 1.0) / 2.0
    val termed = perArm.join(broadcast(ties), Seq("grp"))
      .select(col("grp"), col("n_total"), col("tie3"),
        round(lit(12.0) * d(col("n_j")) * dev * dev /
          (d(col("n_total")) * (d(col("n_total")) + 1.0)) * 1e6, 0)
          .cast(LongType).as("term_micro"))
    val agg = termed.groupBy("grp").agg(count(lit(1)).as("k_arms"),
      first(col("n_total")).as("n"), first(col("tie3")).as("tie3"),
      sum(col("term_micro")).as("h_micro"))
    val corr = lit(1.0) - d(col("tie3")) /
      (d(col("n")) * d(col("n")) * d(col("n")) - d(col("n")))
    val h = d(col("h_micro")) / 1e6
    val out = agg.select(col("grp"), col("k_arms"), col("n"),
      round(when(col("k_arms") < 2L, 0.0).otherwise(h), 6).as("h"),
      round(when(col("k_arms") < 2L, 0.0).otherwise(
        when(corr <= 0.0, 0.0).otherwise(h / corr)), 6).as("h_adj"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells, tv)
    out
  }

  /** Brown–Forsythe variance-equality test per group (Levene's test
    * with MEDIAN centers — the robust variant): are the k arms'
    * spreads equal? The gate a Welch-vs-pooled choice, a mixture
    * rebalance, or a variance-targeting data filter actually needs —
    * mean tests say nothing about spread. Per arm, z = |y − median_j|;
    * the statistic is the one-way ANOVA F on z.
    *
    * Exactness: medians are exact value-domain order statistics from
    * cumulative counts (even n uses the true midpoint via DOUBLED
    * units: z2 = |2y − (v_low + v_high)| stays an exact long); per-arm
    * (n, Σz2, Σz2²) are exact longs (Σz2² overflows past |z2| ≈ 3·10⁶
    * on 10⁶-row arms — the [[welchTTest]] sizing note); the
    * N-normalized SSB/SSW terms are micro-rounded pre-sum so cross-arm
    * folds are exact; F is one division, 6dp. k < 2 arms or zero
    * within-spread reports 0.
    *
    * Scale shape: one (group, arm, value) count shuffle map-side
    * combined; medians, deviations, and both sums-of-squares all live
    * on the value-cardinality-bounded cell table — no second pass
    * over rows and nothing corpus-proportional after the first
    * shuffle.
    *
    * @param df rows with `groupCol`, `armCol`, `vCol` (long micro)
    * @return (grp, k_arms, n, f) — 6dp */
  def brownForsythe(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(groupCol).as("grp"),
        col(armCol).cast(StringType).as("arm"),
        col(vCol).cast(LongType).as("v"))
      .groupBy("grp", "arm", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the median scan AND the deviation pass
    val wCum = Window.partitionBy("grp", "arm").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("grp", "arm")
    val med = cells
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n_j", sum(col("cnt")).over(wAll))
      .groupBy("grp", "arm").agg(
        // integer div via SQL `div` — Column./ on longs is DOUBLE
        // division, which would shift the order-statistic positions
        min(when(col("cum") >= expr("(n_j + 1) div 2"), col("v"))).as("v_lo"),
        min(when(col("cum") >= expr("n_j div 2 + 1"), col("v"))).as("v_hi"))
      .select(col("grp"), col("arm"),
        (col("v_lo") + col("v_hi")).as("med2"))
    val z = cells.join(med, Seq("grp", "arm"))
      .select(col("grp"), col("arm"), col("cnt"),
        abs(lit(2L) * col("v") - col("med2")).as("z2"))
    val perArm = z.groupBy("grp", "arm").agg(sum(col("cnt")).as("n_j"),
      sum(col("cnt") * col("z2")).as("sz"),
      sum(col("cnt") * col("z2") * col("z2")).as("szz"))
    val grand = perArm.groupBy("grp").agg(count(lit(1)).as("k_arms"),
      sum(col("n_j")).as("n"), sum(col("sz")).as("s"))
    def d(c: Column) = c.cast(DoubleType)
    // N-normalized between/within terms, micro-rounded pre-sum:
    // ssb_j = n_j(z̄_j − z̄)²/N, ssw_j = (Σz² − (Σz)²/n_j)/N — the
    // shared 1/N keeps both O(z²) so micro longs hold; it cancels in F
    val joined = perArm.join(broadcast(grand), Seq("grp"))
    val meanJ = d(col("sz")) / d(col("n_j"))
    val meanG = d(col("s")) / d(col("n"))
    val termed = joined.select(col("grp"), col("k_arms"), col("n"),
      round(d(col("n_j")) * (meanJ - meanG) * (meanJ - meanG) /
        d(col("n")) * 1e6, 0).cast(LongType).as("ssb_micro"),
      round((d(col("szz")) - d(col("sz")) * d(col("sz")) / d(col("n_j"))) /
        d(col("n")) * 1e6, 0).cast(LongType).as("ssw_micro"))
    val agg = termed.groupBy("grp").agg(first(col("k_arms")).as("k_arms"),
      first(col("n")).as("n"), sum(col("ssb_micro")).as("ssb"),
      sum(col("ssw_micro")).as("ssw"))
    val out = agg.select(col("grp"), col("k_arms"), col("n"),
      round(when(col("k_arms") < 2L || col("n") <= col("k_arms") ||
          col("ssw") <= 0L, 0.0)
        .otherwise((d(col("ssb")) / (d(col("k_arms")) - 1.0)) /
          (d(col("ssw")) / (d(col("n")) - d(col("k_arms"))))), 6).as("f"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells)
    out
  }

  /** Jonckheere–Terpstra ordered-alternative test per group — does
    * the metric TREND with an ordered factor (dose tiers, priority
    * classes, quality buckets)? [[kruskalWallis]] only asks "any arm
    * different"; JT pools the pairwise Mann–Whitney counts in the
    * arm ORDER, J = Σ_{i<j} U_ij, and gains power exactly when the
    * alternative is monotone. Positive z = the metric rises with the
    * arm index.
    *
    * Exactness: carried as the exact long 2J = Σ_pairs Σ_v
    * c_j(v)·(2·below_i(v) + c_i(v)) (doubled so half-ties stay
    * integral — the [[mannWhitney]] u2 discipline); E[2J] =
    * (N² − Σn_i²) `div` 2 · 2 is exact; the tie-corrected
    * Hollander–Wolfe null variance folds three arm moments and three
    * pooled-tie moments, each an exact long (cubic terms — exact
    * while 2·max(n_j, t)³ < 2⁶³, ~1.6·10⁶ rows per arm or tie class
    * per group); z is one fixed-shape IEEE expression, 6dp.
    * Degenerate (k < 2, N < 3, or zero variance) reports z = 0.
    *
    * Scale shape: one (group, arm, value) count shuffle map-side
    * combined; each cell fans out to its (k−1) ordered pairs (k
    * arms, k² pairs — a handful); the below_i lookups are cumulative
    * windows over (group, pair)-pooled distinct values — value-
    * cardinality-bounded, never corpus-proportional.
    *
    * @param df rows with `groupCol`, `armCol` (long — the ORDER),
    *           `vCol` (long)
    * @return (grp, k_arms, n, j2, e2j, z) — z 6dp */
  def jonckheereTerpstra(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v"): DataFrame =
    jtFinish(kwState(df, groupCol, armCol, vCol))

  /** Finish a [[kwState]] snapshot into the JT trend report — the
    * SAME (grp, arm, value)-count accumulator Kruskal–Wallis streams
    * ([[graft.streaming.StreamingOps.kruskalStateStream]]) serves a
    * second test for free, the [[cliffsDeltaFinish]]-off-
    * [[mannWhitneyState]] discipline. Arms must be numeric (they
    * carry the ORDER); the state's string arm key casts back to
    * long here. State-sized input, batch ≡ merged micro-batches. */
  def jtFinish(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = state.select(col("grp"),
        col("arm").cast(LongType).as("arm"), col("v"), col("cnt"))
      .localCheckpoint() // feeds pair grid, arm sizes, tie moments
    val arms = cells.select("grp", "arm").distinct()
    val pairs = arms.select(col("grp").as("pg"), col("arm").as("ai"))
      .join(arms.select(col("grp").as("g2"), col("arm").as("aj")),
        col("pg") === col("g2") && col("ai") < col("aj"))
      .select(col("pg"), col("ai"), col("aj"))
    // pooled per-pair value table: c0 = lower arm's count, c1 = upper
    val side0 = cells.join(pairs, col("grp") === col("pg") &&
        col("arm") === col("ai"))
      .select(col("grp"), col("ai"), col("aj"), col("v"),
        col("cnt").as("c0"), lit(0L).as("c1"))
    val side1 = cells.join(pairs, col("grp") === col("pg") &&
        col("arm") === col("aj"))
      .select(col("grp"), col("ai"), col("aj"), col("v"),
        lit(0L).as("c0"), col("cnt").as("c1"))
    val pooled = side0.unionAll(side1)
      .groupBy("grp", "ai", "aj", "v")
      .agg(sum(col("c0")).as("c0"), sum(col("c1")).as("c1"))
    val wPrev = Window.partitionBy("grp", "ai", "aj").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val j2Tab = pooled
      .withColumn("below", coalesce(sum(col("c0")).over(wPrev), lit(0L)))
      .groupBy("grp").agg(
        sum(col("c1") * (lit(2L) * col("below") + col("c0"))).as("j2"))
    // arm-size and pooled-tie moments for E[2J] and the HW variance
    val armN = cells.groupBy("grp", "arm").agg(sum(col("cnt")).as("n_j"))
    val armMom = armN.groupBy("grp").agg(
      count(lit(1)).as("k_arms"), sum(col("n_j")).as("n"),
      sum(col("n_j") * col("n_j")).as("sn2"),
      sum(col("n_j") * (col("n_j") - 1L) * (lit(2L) * col("n_j") + 5L))
        .as("a_arm"),
      sum(col("n_j") * (col("n_j") - 1L) * (col("n_j") - 2L)).as("b_arm"),
      sum(col("n_j") * (col("n_j") - 1L)).as("c_arm"))
    val tieMom = cells.groupBy("grp", "v").agg(sum(col("cnt")).as("t"))
      .groupBy("grp").agg(
        sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
          .as("a_tie"),
        sum(col("t") * (col("t") - 1L) * (col("t") - 2L)).as("b_tie"),
        sum(col("t") * (col("t") - 1L)).as("c_tie"))
    def d(c: Column) = c.cast(DoubleType)
    val agg = armMom.join(broadcast(tieMom), Seq("grp"))
      .join(broadcast(j2Tab), Seq("grp"), "left")
      .select(col("grp"), col("k_arms"), col("n"), col("sn2"),
        col("a_arm"), col("b_arm"), col("c_arm"),
        col("a_tie"), col("b_tie"), col("c_tie"),
        coalesce(col("j2"), lit(0L)).as("j2"),
        expr("(n * n - sn2) div 2").as("e2j_half"))
    val nD = d(col("n"))
    val aTerm = (nD * (nD - 1.0) * (lit(2.0) * nD + 5.0) - d(col("a_arm")) -
      d(col("a_tie"))) / 72.0
    val bTerm = d(col("b_arm")) * d(col("b_tie")) /
      (lit(36.0) * nD * (nD - 1.0) * (nD - 2.0))
    val cTerm = d(col("c_arm")) * d(col("c_tie")) /
      (lit(8.0) * nD * (nD - 1.0))
    val varJ = aTerm + bTerm + cTerm
    val out = agg.select(col("grp"), col("k_arms"), col("n"), col("j2"),
      col("e2j_half").as("e2j"),
      round(when(col("k_arms") < 2L || col("n") < 3L, 0.0)
        .otherwise(when(varJ <= 0.0, 0.0).otherwise(
          (d(col("j2")) - d(col("e2j_half"))) /
            (lit(2.0) * sqrt(varJ)))), 6).as("z"))
      .localCheckpoint() // groups-sized; release the cells scaffold
    graft.ext.Checkpoints.release(cells)
    out
  }

  /** Bartlett's test for equality of variances per group — the
    * PARAMETRIC complement of [[brownForsythe]]: under normality it
    * is the most powerful k-sample variance-equality test (BF trades
    * power for outlier robustness; run both — disagreement flags
    * heavy tails). χ² = [(N−k)·ln(s_p²) − Σ_j(n_j−1)·ln(s_j²)] / C,
    * C = 1 + (Σ 1/(n_j−1) − 1/(N−k)) / (3(k−1)), df = k−1.
    *
    * Exactness: per-arm (n, Σy, Σy²) are exact longs (the
    * [[welchTTest]] sufficient statistics); each arm's pooled-
    * variance share (n_j−1)s_j²/(N−k) and weighted-ln term
    * (n_j−1)·ln(s_j²) are micro-rounded pre-sum and the 1/(n_j−1)
    * reciprocals nano-rounded pre-sum (k-bounded order-free folds);
    * χ² is one fixed-shape IEEE expression, 6dp. Exact while
    * s_j²·10⁶ < 2⁶³ — micro-scaled inputs in [0, 10⁶] bound s_j² by
    * 2.5·10¹¹, three orders inside. Arms with n_j < 2 or zero
    * variance cannot enter a log and are EXCLUDED-AND-COUNTED
    * (k_used reports survivors); k_used < 2 reports χ² = 0.
    *
    * Scale shape: one (group, arm) aggregation map-side combined,
    * then groups×arms-sized joins — nothing corpus-proportional
    * after the first shuffle.
    *
    * @param df rows with `groupCol`, `armCol`, `vCol` (long)
    * @return (grp, k_arms, k_used, n_used, dof, chi2) — chi2 6dp */
  def bartlett(df: DataFrame, groupCol: String = "group",
      armCol: String = "arm", vCol: String = "v"): DataFrame =
    bartlettFinish(bartlettState(df, groupCol, armCol, vCol))

  /** The ALGEBRAIC (grp, arm) accumulator (n, Σy, Σy²) — the k-arm
    * sibling of [[welchState]] (arm stays a string key instead of
    * binarizing), three commutative long sums, groups×arms state
    * forever (the streaming-twin state table,
    * [[graft.streaming.StreamingOps.bartlettStateStream]]). */
  private[graft] def bartlettState(df: DataFrame,
      groupCol: String = "group", armCol: String = "arm",
      vCol: String = "v"): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(armCol).cast(StringType).as("arm"),
        col(vCol).cast(LongType).as("y"))
      .groupBy("grp", "arm").agg(count(lit(1)).as("n"),
        sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))

  /** Finish a [[bartlettState]] snapshot into the χ² report —
    * state-sized input, batch ≡ merged micro-batches. */
  def bartlettFinish(state: DataFrame): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    val ok = col("n") >= 2L &&
      (col("n") * col("ss") - col("s") * col("s")) > 0L
    val flagged = state.select(col("grp"), col("n"), col("s"), col("ss"),
      ok.as("ok"))
    // totals derive from the same relation as the probe side; rename
    // the grouping key so a streaming memory-table state never hits
    // the resolver's conflicting-references check (the psiFinish fix)
    val tot = state.select(col("grp").as("tg"),
        col("n").as("tn"), ok.as("tok"))
      .groupBy("tg").agg(
        count(lit(1)).as("k_arms"),
        sum(when(col("tok"), 1L).otherwise(0L)).as("k_used"),
        sum(when(col("tok"), col("tn")).otherwise(0L)).as("n_used"))
    val varJ = (d(col("n")) * d(col("ss")) - d(col("s")) * d(col("s"))) /
      (d(col("n")) * (d(col("n")) - 1.0))
    val nk = d(col("n_used")) - d(col("k_used"))
    val terms = flagged
      .join(broadcast(tot), col("grp") === col("tg"))
      .filter(col("ok") && col("k_used") >= 2L)
      .select(col("grp"),
        round((d(col("n")) - 1.0) * varJ / nk * lit(1e6), 0)
          .cast(LongType).as("pool_micro"),
        round((d(col("n")) - 1.0) * log(varJ) * lit(1e6), 0)
          .cast(LongType).as("ln_micro"),
        round(lit(1e9) / (d(col("n")) - 1.0), 0)
          .cast(LongType).as("inv_nano"))
    val folded = terms.groupBy("grp").agg(
      sum(col("pool_micro")).as("pool"), sum(col("ln_micro")).as("lns"),
      sum(col("inv_nano")).as("invs"))
    val agg = tot.join(folded, col("tg") === folded("grp"), "left")
    val nkA = d(col("n_used")) - d(col("k_used"))
    val sp2 = d(col("pool")) / lit(1e6)
    val num = nkA * log(sp2) - d(col("lns")) / lit(1e6)
    val cFac = lit(1.0) + (d(col("invs")) / lit(1e9) - lit(1.0) / nkA) /
      (lit(3.0) * (d(col("k_used")) - 1.0))
    agg.select(col("tg").as("grp"), col("k_arms"), col("k_used"),
      col("n_used"),
      greatest(col("k_used") - 1L, lit(0L)).as("dof"),
      round(when(col("k_used") < 2L || col("pool").isNull ||
          col("pool") <= 0L, 0.0)
        .otherwise(num / cFac), 6).as("chi2"))
  }

  /** Kendall's coefficient of concordance W per group — DO the m
    * raters agree on the RANKING of n items? The ordinal-consensus
    * statistic the κ family (categorical) and [[cochranQ]] (binary)
    * cannot express, and the multi-rater extension of a rank
    * correlation: W = 12S / (m²(n³−n) − m·ΣT), S = Σ_i (R_i − R̄)²
    * over per-item rank sums, T_j = Σ(t³−t) the per-rater tie mass.
    *
    * Complete-block contract (like [[cochranQ]]): only items rated by
    * ALL m raters enter (m = the group's distinct-rater count), and
    * at most one score per (rater, item) — duplicates collapse to
    * max(score) so malformed panels cannot inflate rank sums.
    *
    * Exactness: mid-ranks arrive DOUBLED (2·mr = 2·below + t + 1) so
    * per-item rank sums r2_i = Σ_j 2·mr_j are exact longs; 4S =
    * Σr2² − 2c·Σr2 + n·c² with c = m(n+1) is an exact long identity
    * (bounded through m²n³ < 2⁶³, e.g. 100 raters × 10⁵ items); W is
    * one fixed-shape IEEE division, 6dp. Degenerate (n < 2 or zero
    * denominator) reports 0.
    *
    * Scale shape: the rank window runs over (group, rater, value)
    * cells — value-cardinality-bounded per rater; every join is
    * co-keyed on (grp, rater, score) or (grp, item); nothing is ever
    * corpus-proportional after the first count shuffle.
    *
    * @param df rows with `groupCol`, `raterCol`, `itemCol`,
    *           `scoreCol` (long)
    * @return (grp, m_raters, n_items, s4, tie_sum, w) — w 6dp */
  def kendallW(df: DataFrame, groupCol: String = "group",
      raterCol: String = "rater", itemCol: String = "item",
      scoreCol: String = "score"): DataFrame = {
    val agg = kendallWState(df, groupCol, raterCol, itemCol, scoreCol)
    def d(c: Column) = c.cast(DoubleType)
    agg.select(col("grp"), col("m").as("m_raters"),
      col("n_items"), kwS4.as("s4"), col("tie_sum"),
      round(when(col("n_items") < 2L, 0.0).otherwise(
        when(kwDenom <= 0.0, 0.0).otherwise(lit(3.0) * d(kwS4) / kwDenom)),
        6).as("w"))
  }

  /** Friedman's rank test per group — the SIGNIFICANCE shape on the
    * [[kendallW]] consensus: for m raters (blocks) ranking n items
    * (treatments), χ²_F = m·(n−1)·W with the tie-corrected W, df =
    * n−1 — the classic identity, so the statistic is a SECOND FINISH
    * over the one concordance state (the [[cliffsDelta]]-off-
    * Mann–Whitney discipline; same complete-block contract, same
    * exact-long 4S identity). Large χ²_F at df = n−1 rejects "the
    * raters rank the items interchangeably".
    *
    * Degenerate (n < 2 or zero denominator) reports 0 like W itself.
    *
    * @return (grp, m_raters, n_items, dof, chi2_f) — chi2_f 6dp */
  def friedmanTest(df: DataFrame, groupCol: String = "group",
      raterCol: String = "rater", itemCol: String = "item",
      scoreCol: String = "score"): DataFrame = {
    val agg = kendallWState(df, groupCol, raterCol, itemCol, scoreCol)
    def d(c: Column) = c.cast(DoubleType)
    agg.select(col("grp"), col("m").as("m_raters"), col("n_items"),
      (col("n_items") - 1L).as("dof"),
      round(when(col("n_items") < 2L, 0.0).otherwise(
        when(kwDenom <= 0.0, 0.0).otherwise(
          d(col("m")) * (d(col("n_items")) - 1.0) *
            (lit(3.0) * d(kwS4) / kwDenom))), 6).as("chi2_f"))
  }

  /** 4S = Σr2² − 2c·Σr2 + n·c², c = m(n+1) — exact long identity
    * over the [[kendallWState]] columns. */
  private def kwS4: Column =
    col("srr") - lit(2L) * col("m") * (col("n_items") + 1L) *
      col("sr") + col("n_items") * col("m") * (col("n_items") + 1L) *
      col("m") * (col("n_items") + 1L)

  /** Tie-corrected W denominator m²(n³−n) − m·ΣT over the state. */
  private def kwDenom: Column = {
    def d(c: Column) = c.cast(DoubleType)
    d(col("m")) * d(col("m")) *
      (d(col("n_items")) * d(col("n_items")) * d(col("n_items")) -
        d(col("n_items"))) - d(col("m")) * d(col("tie_sum"))
  }

  /** The shared concordance state (grp, n_items, sr, srr, m,
    * tie_sum) both [[kendallW]] and [[friedmanTest]] finish from —
    * complete-block census, doubled mid-ranks, per-rater tie masses;
    * groups-sized and checkpointed, scaffolds released. */
  private[graft] def kendallWState(df: DataFrame, groupCol: String,
      raterCol: String, itemCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val one = df.select(col(groupCol).as("grp"),
        col(raterCol).cast(StringType).as("rater"),
        col(itemCol).cast(StringType).as("item"),
        col(scoreCol).cast(LongType).as("score"))
      .groupBy("grp", "rater", "item").agg(max(col("score")).as("score"))
      .localCheckpoint() // feeds panel census, rank cells, item join
    val mTab = one.groupBy("grp").agg(countDistinct(col("rater")).as("m"))
    val keep = one.groupBy("grp", "item")
      .agg(countDistinct(col("rater")).as("cr"))
      .join(broadcast(mTab), Seq("grp"))
      .filter(col("cr") === col("m")).select("grp", "item")
    val ratings = one.join(keep, Seq("grp", "item"))
      .localCheckpoint() // complete panel; feeds cells AND the rank join
    val cells = ratings.groupBy("grp", "rater", "score")
      .agg(count(lit(1)).as("t"))
    val wPrev = Window.partitionBy("grp", "rater").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells.withColumn("below",
        coalesce(sum(col("t")).over(wPrev), lit(0L)))
      .select(col("grp"), col("rater"), col("score"),
        (lit(2L) * col("below") + col("t") + 1L).as("mr2"),
        (col("t") * col("t") * col("t") - col("t")).as("tie"))
      .localCheckpoint() // feeds the item join AND the tie rollup
    val perItem = ratings.join(ranked.select("grp", "rater", "score", "mr2"),
        Seq("grp", "rater", "score"))
      .groupBy("grp", "item").agg(sum(col("mr2")).as("r2_i"))
      // item POSITION by name order (items-bounded window) — feeds
      // [[pageTrend]]'s Σj·R_j moment; W and Friedman ignore it
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy("item")).cast(LongType))
    val tieSum = ranked.groupBy("grp").agg(sum(col("tie")).as("tie_sum"))
    val out = perItem.groupBy("grp").agg(count(lit(1)).as("n_items"),
      sum(col("r2_i")).as("sr"), sum(col("r2_i") * col("r2_i")).as("srr"),
      sum(col("rk") * col("r2_i")).as("sjr"))
      .join(broadcast(mTab), Seq("grp"))
      .join(broadcast(tieSum), Seq("grp"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(one, ratings, ranked)
    out
  }

  /** Page's L trend test per group — the ORDERED-alternative shape on
    * the [[kendallW]] panel, completing the trio the way
    * [[jonckheereTerpstra]] completes [[kruskalWallis]]: items carry
    * a natural order (months, doses, versions — here the item-name
    * sort), and L = Σ_j j·R_j concentrates power on "the rank sums
    * RISE along that order" where Friedman only asks "differ at
    * all?". χ²_L = (12L − 3mn(n+1)²)² / (m n²(n+1)(n²−1)), df = 1;
    * `trend` reports the direction (+1 rising, −1 falling).
    *
    * A THIRD FINISH over [[kendallWState]] (complete-block census,
    * doubled mid-ranks): L rides the state's Σ position·R2_i moment,
    * so 12L = 6·Σj·r2 and the χ² numerator is an exact long;
    * mid-rank ties flow into L exactly while the χ² normalization
    * keeps the classical tie-free null variance (documented
    * contract — Page's own tables assume it). Exact while
    * 3mn(n+1)² < 2⁶³ (~10⁶ items at 100 raters). Degenerate (n < 2
    * or a zero denominator) reports 0.
    *
    * @return (grp, m_raters, n_items, l2, dof, chi2_l, trend) */
  def pageTrend(df: DataFrame, groupCol: String = "group",
      raterCol: String = "rater", itemCol: String = "item",
      scoreCol: String = "score"): DataFrame = {
    val agg = kendallWState(df, groupCol, raterCol, itemCol, scoreCol)
    def d(c: Column) = c.cast(DoubleType)
    val n = col("n_items")
    val num = lit(6L) * col("sjr") -
      lit(3L) * col("m") * n * (n + 1L) * (n + 1L)
    val den = col("m") * n * n * (n + 1L) * (n * n - 1L)
    agg.select(col("grp"), col("m").as("m_raters"), col("n_items"),
      col("sjr").as("l2"), lit(1L).as("dof"),
      round(when(n < 2L || den === 0L, 0.0)
        .otherwise(d(num) * d(num) / d(den)), 6).as("chi2_l"),
      when(n < 2L || den === 0L, 0L)
        .otherwise(signum(d(num)).cast(LongType)).as("trend"))
  }

  /** Cronbach's α per group — INTERNAL CONSISTENCY of a k-item scale
    * (do the k rubric dimensions / probe questions measure one
    * underlying trait?): α = k/(k−1) · (1 − Σ_i σ²_i / σ²_total),
    * item variances against the variance of per-subject total scores.
    * The instrument-reliability check that precedes trusting any
    * multi-item eval rubric; the agreement family ([[cohenKappa]],
    * [[kendallW]]) asks whether RATERS agree — α asks whether ITEMS do.
    *
    * Complete-block contract: only subjects scored on ALL k items
    * enter (k = the group's distinct-item count); duplicate
    * (subject, item) rows collapse to max(score).
    *
    * Exactness: per-item and per-subject-total (n, Σ, Σ²) are exact
    * longs (Σ² bounds as in [[welchTTest]]); each item's sample
    * variance is micro-rounded pre-sum so the k-item fold is exact
    * and order-free; α is one fixed-shape IEEE expression, 6dp.
    * k < 2, n < 2, or zero total variance reports 0.
    *
    * Scale shape: one (group, subject, item) dedup shuffle, a
    * k-bounded item rollup, and a subject-keyed total rollup — both
    * map-side combined; nothing after them exceeds k or subject
    * cardinality.
    *
    * @param df rows with `groupCol`, `subjectCol`, `itemCol`,
    *           `scoreCol` (long)
    * @return (grp, k_items, n_subjects, item_var_sum, total_var,
    *         alpha) — 6dp */
  def cronbachAlpha(df: DataFrame, groupCol: String = "group",
      subjectCol: String = "subject", itemCol: String = "item",
      scoreCol: String = "score"): DataFrame = {
    val one = df.select(col(groupCol).as("grp"),
        col(subjectCol).cast(StringType).as("subject"),
        col(itemCol).cast(StringType).as("item"),
        col(scoreCol).cast(LongType).as("score"))
      .groupBy("grp", "subject", "item").agg(max(col("score")).as("score"))
      .localCheckpoint() // feeds item census + both variance passes
    val kTab = one.groupBy("grp").agg(countDistinct(col("item")).as("k"))
    val keep = one.groupBy("grp", "subject")
      .agg(countDistinct(col("item")).as("ci"))
      .join(broadcast(kTab), Seq("grp"))
      .filter(col("ci") === col("k")).select("grp", "subject")
    val scores = one.join(keep, Seq("grp", "subject"))
      .localCheckpoint() // complete panel; feeds items AND totals
    def d(c: Column) = c.cast(DoubleType)
    def sampVar(n: Column, s: Column, ss: Column): Column =
      (d(n) * d(ss) - d(s) * d(s)) / (d(n) * (d(n) - 1.0))
    val perItem = scores.groupBy("grp", "item").agg(
        count(lit(1)).as("n"), sum(col("score")).as("s"),
        sum(col("score") * col("score")).as("ss"))
      .select(col("grp"), col("n"),
        round(when(col("n") < 2L, 0.0)
          .otherwise(sampVar(col("n"), col("s"), col("ss"))) * 1e6, 0)
          .cast(LongType).as("var_micro"))
    val itemAgg = perItem.groupBy("grp").agg(
      sum(col("var_micro")).as("ivar_micro"), max(col("n")).as("n_subjects"))
    val totals = scores.groupBy("grp", "subject")
      .agg(sum(col("score")).as("tot"))
      .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("tot")).as("s"),
        sum(col("tot") * col("tot")).as("ss"))
    val joined = itemAgg.join(broadcast(kTab), Seq("grp"))
      .join(totals, Seq("grp"))
    val tVar = sampVar(col("n"), col("s"), col("ss"))
    val out = joined.select(col("grp"), col("k").as("k_items"),
      col("n_subjects"),
      round(d(col("ivar_micro")) / 1e6, 6).as("item_var_sum"),
      round(when(col("n") < 2L, 0.0).otherwise(tVar), 6).as("total_var"),
      round(when(col("k") < 2L || col("n") < 2L, 0.0).otherwise(
        when(tVar <= 0.0, 0.0).otherwise(
          d(col("k")) / (d(col("k")) - 1.0) *
            (lit(1.0) - d(col("ivar_micro")) / 1e6 / tVar))), 6).as("alpha"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(one, scores)
    out
  }

  /** Split-half reliability with the Spearman–Brown correction per
    * group — [[cronbachAlpha]]'s classical cross-check: split the k
    * items into two fixed halves (odd/even by the item-name rank —
    * deterministic, no sampling), correlate the per-subject
    * half-sums, and step the half-length r up to full length:
    * SB = 2r/(1+r). α assumes tau-equivalence; a split-half far
    * below α flags a scale whose items do NOT measure one trait
    * evenly (the α-vs-SB gap is the diagnostic).
    *
    * Complete-block contract and dedup exactly as [[cronbachAlpha]].
    * Exactness: half-sums and all five co-moments (n, Σx, Σy, Σx²,
    * Σy², Σxy) are exact longs; r and SB are one fixed-shape IEEE
    * expression, 6dp. Degenerate (k < 2, n < 2, zero variance in
    * either half, or 1 + r ≤ 0) reports 0.
    *
    * Scale shape: the [[cronbachAlpha]] plan with one extra
    * row_number over the (group, item) table (k-bounded) — one
    * dedup shuffle, one subject-keyed rollup, nothing more.
    *
    * @return (grp, k_items, n_subjects, r_halves, sb) — 6dp */
  def splitHalf(df: DataFrame, groupCol: String = "group",
      subjectCol: String = "subject", itemCol: String = "item",
      scoreCol: String = "score"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val one = df.select(col(groupCol).as("grp"),
        col(subjectCol).cast(StringType).as("subject"),
        col(itemCol).cast(StringType).as("item"),
        col(scoreCol).cast(LongType).as("score"))
      .groupBy("grp", "subject", "item").agg(max(col("score")).as("score"))
      .localCheckpoint() // feeds item census + the half-sum pass
    val kTab = one.groupBy("grp").agg(countDistinct(col("item")).as("k"))
    val keep = one.groupBy("grp", "subject")
      .agg(countDistinct(col("item")).as("ci"))
      .join(broadcast(kTab), Seq("grp"))
      .filter(col("ci") === col("k")).select("grp", "subject")
    val halves = one.select("grp", "item").distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("grp").orderBy("item")))
      .select(col("grp"), col("item"), (col("rk") % 2).as("half"))
    val sums = one.join(keep, Seq("grp", "subject"))
      .join(broadcast(halves), Seq("grp", "item"))
      .groupBy("grp", "subject").agg(
        sum(when(col("half") === 1, col("score")).otherwise(0L)).as("x"),
        sum(when(col("half") === 0, col("score")).otherwise(0L)).as("y"))
    val agg = sums.groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .join(broadcast(kTab), Seq("grp"))
    def d(c: Column) = c.cast(DoubleType)
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val den = sqrt((d(col("n")) * d(col("sxx")) -
      d(col("sx")) * d(col("sx"))) *
      (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))))
    val r = num / den
    val out = agg.select(col("grp"), col("k").as("k_items"),
      col("n").as("n_subjects"),
      round(when(col("k") < 2L || col("n") < 2L, 0.0)
        .otherwise(when(den <= 0.0, 0.0).otherwise(r)), 6).as("r_halves"),
      round(when(col("k") < 2L || col("n") < 2L, 0.0)
        .otherwise(when(den <= 0.0, 0.0).otherwise(
          when(lit(1.0) + r <= 0.0, 0.0)
            .otherwise(lit(2.0) * r / (lit(1.0) + r)))), 6).as("sb"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(one)
    out
  }

  /** Intraclass correlation ICC(2,1) per group — absolute-agreement
    * reliability of CONTINUOUS ratings under the two-way random
    * effects model (Shrout & Fleiss 1979): the κ family reads
    * categories, [[kendallW]] reads rankings, [[cronbachAlpha]] reads
    * scale consistency — ICC is the number for "do raters give the
    * same SCORE", the standard readout for scored eval rubrics.
    * ICC(2,1) = (MSR − MSE) / (MSR + (k−1)·MSE + k·(MSC − MSE)/n)
    * from the two-way ANOVA decomposition over a complete n×k panel.
    *
    * Complete-block contract (as [[cronbachAlpha]]): only subjects
    * scored by ALL k raters enter; duplicate (subject, rater) rows
    * collapse to max(score).
    *
    * Exactness: the four sufficient statistics — G = Σy, Q = Σy²,
    * SR = Σ_i T_i² (squared subject totals), SC = Σ_j C_j² (squared
    * rater totals) — are exact long sums (T_i² ≤ (k·|y|max)²; size
    * the score unit so SR stays under 2⁶³ — rubric scores in small
    * integers sit far below); every mean square and the ICC are one
    * fixed-shape IEEE expression over them, 6dp. n < 2, k < 2, or a
    * zero denominator reports 0.
    *
    * Scale shape: one (grp, subject, rater) dedup shuffle, then a
    * subject-keyed and a rater-keyed rollup (both map-side combined)
    * folding to four longs per group — nothing after the first
    * shuffle exceeds subject or rater cardinality.
    *
    * @param df rows with `groupCol`, `subjectCol`, `raterCol`,
    *           `scoreCol` (long)
    * @return (grp, n_subjects, k_raters, msr, msc, mse, icc) — 6dp */
  def icc21(df: DataFrame, groupCol: String = "group",
      subjectCol: String = "subject", raterCol: String = "rater",
      scoreCol: String = "score"): DataFrame = {
    val one = df.select(col(groupCol).as("grp"),
        col(subjectCol).cast(StringType).as("subject"),
        col(raterCol).cast(StringType).as("rater"),
        col(scoreCol).cast(LongType).as("score"))
      .groupBy("grp", "subject", "rater").agg(max(col("score")).as("score"))
      .localCheckpoint() // feeds the panel census + three rollups
    val kTab = one.groupBy("grp").agg(countDistinct(col("rater")).as("k"))
    val keep = one.groupBy("grp", "subject")
      .agg(countDistinct(col("rater")).as("cr"))
      .join(broadcast(kTab), Seq("grp"))
      .filter(col("cr") === col("k")).select("grp", "subject")
    val scores = one.join(keep, Seq("grp", "subject"))
      .localCheckpoint() // complete panel; feeds all three rollups
    val bySubject = scores.groupBy("grp", "subject")
      .agg(sum(col("score")).as("t"))
      .groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("t") * col("t")).as("sr"), sum(col("t")).as("g"))
    val byRater = scores.groupBy("grp", "rater")
      .agg(sum(col("score")).as("c"))
      .groupBy("grp").agg(sum(col("c") * col("c")).as("sc"))
    val q = scores.groupBy("grp")
      .agg(sum(col("score") * col("score")).as("q"))
    def d(c: String) = col(c).cast(DoubleType)
    val joined = bySubject.join(byRater, Seq("grp")).join(q, Seq("grp"))
      .join(broadcast(kTab), Seq("grp"))
    val nk = d("n") * d("k")
    val corr = d("g") * d("g") / nk
    val ssr = d("sr") / d("k") - corr
    val ssc = d("sc") / d("n") - corr
    val sst = d("q") - corr
    val sse = sst - ssr - ssc
    val msr = ssr / (d("n") - 1.0)
    val msc = ssc / (d("k") - 1.0)
    val mse = sse / ((d("n") - 1.0) * (d("k") - 1.0))
    val den = msr + (d("k") - 1.0) * mse + d("k") * (msc - mse) / d("n")
    val degenerate = col("n") < 2L || col("k") < 2L
    val out = joined.select(col("grp"), col("n").as("n_subjects"),
      col("k").as("k_raters"),
      round(when(degenerate, 0.0).otherwise(msr), 6).as("msr"),
      round(when(degenerate, 0.0).otherwise(msc), 6).as("msc"),
      round(when(degenerate, 0.0).otherwise(mse), 6).as("mse"),
      round(when(degenerate, 0.0).otherwise(
        when(den <= 0.0, 0.0).otherwise((msr - mse) / den)), 6).as("icc"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(one, scores)
    out
  }

  /** Post-stratified average treatment effect per group — the
    * direct-standardization estimator between [[mantelHaenszel]]
    * (binary outcomes, odds scale) and [[cupedAdjust]] (covariate
    * regression): ATE = Σ_s (n_s/N)·(ȳ₁ₛ − ȳ₀ₛ) over strata, with
    * SE² = Σ_s (n_s/N)²·(s²₁ₛ/n₁ₛ + s²₀ₛ/n₀ₛ). The Simpson-safe mean
    * readout when arms are imbalanced across strata — the pooled
    * [[welchTTest]] would confound stratum mix with treatment.
    *
    * Strata missing an arm (or with a single-row arm, undefined
    * variance) are EXCLUDED from the estimate and counted in
    * n_strata − n_used — dbt-test-style visibility instead of a
    * silent bias.
    *
    * Exactness: per-(stratum, arm) (n, Σy, Σy²) are exact longs
    * ([[welchTTest]] sizing note); each stratum's ATE and variance
    * contribution is rounded to a NANO long pre-sum (stratum terms
    * are O(y), the fold is strata-bounded and order-free); the
    * published effect/SE/z are single fixed-shape IEEE expressions,
    * 6dp. No usable stratum reports 0.
    *
    * Scale shape: ONE (group, stratum, arm) shuffle map-side
    * combined, then everything is strata-bounded.
    *
    * @param df rows with `groupCol`, `stratumCol`, `armCol`
    *           (0 = control, else treated) and `yCol` (long micro)
    * @return (grp, n_strata, n_used, n, ate, se, z) — 6dp */
  def postStratifiedAte(df: DataFrame, groupCol: String = "group",
      stratumCol: String = "stratum", armCol: String = "arm",
      yCol: String = "y"): DataFrame = {
    val cells = df.select(col(groupCol).as("grp"),
        col(stratumCol).cast(StringType).as("stratum"),
        when(col(armCol).cast(LongType) === 0L, 0L).otherwise(1L).as("arm"),
        col(yCol).cast(LongType).as("y"))
      .groupBy("grp", "stratum", "arm").agg(count(lit(1)).as("n"),
        sum(col("y")).as("s"), sum(col("y") * col("y")).as("ss"))
    def d(c: String) = col(c).cast(DoubleType)
    val strata = cells.groupBy("grp", "stratum").agg(
      sum(when(col("arm") === 0L, col("n")).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0L, col("s")).otherwise(0L)).as("s0"),
      sum(when(col("arm") === 0L, col("ss")).otherwise(0L)).as("ss0"),
      sum(when(col("arm") =!= 0L, col("n")).otherwise(0L)).as("n1"),
      sum(when(col("arm") =!= 0L, col("s")).otherwise(0L)).as("s1"),
      sum(when(col("arm") =!= 0L, col("ss")).otherwise(0L)).as("ss1"))
    val usable = col("n0") >= 2L && col("n1") >= 2L
    val totals = strata.groupBy("grp").agg(
      count(lit(1)).as("n_strata"),
      sum(when(usable, 1L).otherwise(0L)).as("n_used"),
      sum(when(usable, col("n0") + col("n1")).otherwise(0L)).as("n"))
    def sampVar(n: String, s: String, ss: String): Column =
      (d(n) * d(ss) - d(s) * d(s)) / (d(n) * (d(n) - 1.0))
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val joined = strata.join(broadcast(totals), Seq("grp"))
    val w = (d("n0") + d("n1")) / d("n")
    val diff = d("s1") / d("n1") - d("s0") / d("n0")
    val varT = sampVar("n1", "s1", "ss1") / d("n1") +
      sampVar("n0", "s0", "ss0") / d("n0")
    val termed = joined.filter(usable).select(col("grp"),
      nano(w * diff).as("ate_nano"), nano(w * w * varT).as("var_nano"))
    val agg = termed.groupBy("grp").agg(
      sum(col("ate_nano")).as("ate_nano"), sum(col("var_nano")).as("var_nano"))
    val se = sqrt(coalesce(d("var_nano"), lit(0.0)) / 1e9)
    totals.join(agg, Seq("grp"), "left")
      .select(col("grp"), col("n_strata"), col("n_used"), col("n"),
        round(coalesce(d("ate_nano"), lit(0.0)) / 1e9, 6).as("ate"),
        round(se, 6).as("se"),
        round(when(coalesce(col("var_nano"), lit(0L)) <= 0L, 0.0)
          .otherwise(coalesce(d("ate_nano"), lit(0.0)) / 1e9 / se), 6)
          .as("z"))
  }

  /** First-order partial correlation per group — does x predict y
    * BEYOND the shared confounder z? r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)). The "is this correlation just length"
    * check every corpus-feature analysis needs before believing a
    * raw Pearson r ([[graft.ext.Curation.columnMi]] grades
    * categorical dependence; this is the continuous-triple analog).
    *
    * Exactness: all nine co-moments (n, Σx, Σy, Σz, Σx², Σy², Σz²,
    * Σxy, Σxz, Σyz) are exact long sums (cross-product bounds as in
    * [[welchTTest]] — size the metric units so |x·y|·n < 2⁶³); the
    * three Pearson r's and the partial are one fixed-shape IEEE
    * expression, 6dp. n < 3, a zero marginal variance, or a
    * degenerate denominator (|r_xz| or |r_yz| = 1) reports 0.
    *
    * Scale shape: ONE map-side-combined aggregation per group —
    * nothing else.
    *
    * @param df rows with `groupCol`, `xCol`, `yCol`, `zCol` (longs)
    * @return (grp, n, r_xy, r_xz, r_yz, r_partial) — 6dp */
  def partialCorr(df: DataFrame, groupCol: String = "group",
      xCol: String = "x", yCol: String = "y", zCol: String = "z")
      : DataFrame = {
    val agg = df.select(col(groupCol).as("grp"),
        col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"),
        col(zCol).cast(LongType).as("z"))
      .groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("z")).as("sxz"),
        sum(col("y") * col("z")).as("syz"))
    def d(c: String) = col(c).cast(DoubleType)
    def r(sab: String, sa: String, sb: String, saa: String,
        sbb: String): Column = {
      val num = d("n") * d(sab) - d(sa) * d(sb)
      val den = sqrt((d("n") * d(saa) - d(sa) * d(sa)) *
        (d("n") * d(sbb) - d(sb) * d(sb)))
      when(den <= 0.0, 0.0).otherwise(num / den)
    }
    val rxy = r("sxy", "sx", "sy", "sxx", "syy")
    val rxz = r("sxz", "sx", "sz", "sxx", "szz")
    val ryz = r("syz", "sy", "sz", "syy", "szz")
    val pden = sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    agg.select(col("grp"), col("n"),
      round(rxy, 6).as("r_xy"), round(rxz, 6).as("r_xz"),
      round(ryz, 6).as("r_yz"),
      round(when(col("n") < 3L, 0.0).otherwise(
        when(pden <= 0.0, 0.0).otherwise((rxy - rxz * ryz) / pden)), 6)
        .as("r_partial"))
  }

  /** Cumulative gain / lift table per group — the "how much better
    * than random is this ranking" business readout beside [[aucRoc]]'s
    * single number: rank by score descending, cut into `buckets`
    * equal-population bins, report per-bin and cumulative capture.
    * The decision table behind "score the corpus, keep the top 20%".
    *
    * Determinism contract: bins are assigned on the DISTINCT-SCORE
    * cell table — a score cell lands whole in the bin its LAST
    * cumulative row falls in (⌈cum·B/N⌉, integer arithmetic), so tied
    * scores can never straddle a boundary differently in two engines
    * (a row_number/ntile cut would). Bins may therefore be slightly
    * unequal under heavy ties — that is the published semantics.
    *
    * Exactness: all counts and the cumulatives are exact longs on
    * score-cardinality-bounded windows (the [[aucRoc]] argument);
    * gain and lift are single fixed-shape IEEE divisions, 6dp. A
    * group with zero positives reports gain = lift = 0.
    *
    * @param df rows with `groupCol`, `scoreCol` (long micro) and
    *           `yCol` (0/1 label)
    * @return (grp, bucket, n, pos, cum_n, cum_pos, gain, lift) */
  def liftGain(df: DataFrame, groupCol: String = "group",
      scoreCol: String = "score_micro", yCol: String = "y",
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(groupCol).as("grp"),
        col(scoreCol).cast(LongType).as("score"),
        col(yCol).cast(LongType).as("y"))
      .groupBy("grp", "score").agg(count(lit(1)).as("cnt"),
        sum(when(col("y") =!= 0L, 1L).otherwise(0L)).as("pos"))
    val wCum = Window.partitionBy("grp").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("grp")
    val binned = cells
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n_total", sum(col("cnt")).over(wAll))
      .withColumn("p_total", sum(col("pos")).over(wAll))
      // ⌈cum·B/N⌉ via (cum·B + N − 1) div N — SQL `div` (Column./ on
      // longs is DOUBLE division and would fractionalize the bucket)
      .withColumn("bucket",
        expr(s"(cum * $buckets + n_total - 1) div n_total"))
    val perBin = binned.groupBy("grp", "bucket").agg(
      sum(col("cnt")).as("n"), sum(col("pos")).as("pos"),
      max(col("n_total")).as("n_total"), max(col("p_total")).as("p_total"))
    val wBin = Window.partitionBy("grp").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: String) = col(c).cast(DoubleType)
    perBin
      .withColumn("cum_n", sum(col("n")).over(wBin))
      .withColumn("cum_pos", sum(col("pos")).over(wBin))
      .select(col("grp"), col("bucket"), col("n"), col("pos"),
        col("cum_n"), col("cum_pos"),
        round(when(col("p_total") === 0L, 0.0)
          .otherwise(d("cum_pos") / d("p_total")), 6).as("gain"),
        round(when(col("p_total") === 0L, 0.0)
          .otherwise((d("cum_pos") / d("cum_n")) /
            (d("p_total") / d("n_total"))), 6).as("lift"))
  }
}
