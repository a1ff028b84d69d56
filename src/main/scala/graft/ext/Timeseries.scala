package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Time-series analytics over an event stream — the monitoring layer
  * of a large ingestion pipeline (no direct reference analog: the
  * reference's models are dimension marts,
  * `/root/reference/models/marts/user_base.sql`; this family covers
  * the event-stream monitoring a production deployment of it needs):
  * once events are aggregated to a daily series, detect level shifts
  * (CUSUM), measure periodicity (autocorrelation), and smooth for
  * dashboards (EWMA).
  *
  * Scale shape: every operator here first reduces the raw stream with
  * ONE map-side-partial aggregation (`groupBy(date)` — 100 TB of
  * events collapse to one row per day per partial before the
  * shuffle), and all subsequent analysis runs on the tiny aggregated
  * series. The series-level joins are broadcast by size; nothing
  * after the first shuffle depends on raw-data volume.
  *
  * Exactness contract: daily counts are integers, so deviations from
  * the mean are computed in MEAN-CLEARED SCALED-INTEGER form —
  * `r_t = N·x_t − T` (N days, T total) is `N·(x_t − mean)` without
  * ever forming the non-integer mean — keeping every intermediate a
  * long. Only the final ratios perform one double division before
  * micro-rounding, which is bit-identical across engines.
  */
object Timeseries {

  /** Daily event counts with a dense 0-based day index (`datediff`
    * from the series minimum). The index makes lag arithmetic a plain
    * integer join key — no date arithmetic in the hot path. */
  def dailySeries(events: DataFrame, tsCol: String = "ts"): DataFrame = {
    val daily = events.groupBy(to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    daily.crossJoin(broadcast(daily.agg(min(col("d")).as("d0"))))
      .select(col("d"), datediff(col("d"), col("d0")).as("idx"), col("n"))
  }

  /** CUSUM level-shift detection over the daily series.
    *
    * The classic cumulative-sum statistic `S_t = Σ_{i≤t}(x_i − x̄)`
    * peaks (in absolute value) at the most likely changepoint. To
    * stay integer-exact the sum is scaled by N: `S'_t = Σ(N·x_i − T)
    * = N·S_t`, which preserves the argmax. Emits the scaled statistic
    * and flags the peak day(s).
    *
    * @return (d, n, cusum_scaled, is_peak) ordered by date.
    */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val s = dailySeries(events)
    val tot = s.agg(sum(col("n")).as("t"), count(lit(1)).as("nd"))
    val dev = s.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (col("nd") * col("n") - col("t")).as("r"))
    val cum = dev.withColumn("cusum_scaled",
      sum(col("r")).over(Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(
        cum.agg(max(abs(col("cusum_scaled"))).as("peak"))))
      .select(col("d"), col("n"), col("cusum_scaled"),
        (abs(col("cusum_scaled")) === col("peak")).as("is_peak"))
      .orderBy(col("d"))
  }

  /** Autocorrelation of the daily series at lags 1..`maxLag`.
    *
    * `acf_k = Σ r_t·r_{t+k} / Σ r_t²` with the mean-cleared scaled
    * residuals `r_t = N·x_t − T` (the N² scale cancels in the ratio).
    * Numerator and denominator are exact longs; the single final
    * division is micro-rounded. The lagged pairing is an equi-join on
    * the dense day index (`b.idx = a.idx + k`), driven by a
    * broadcast lag dimension — at any data scale this runs on the
    * ~N-row aggregated series, not the raw stream.
    *
    * @return (lag, n_pairs, acf_micro) ordered by lag.
    */
  def acf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val s = dailySeries(events)
    val tot = s.agg(sum(col("n")).as("t"), count(lit(1)).as("nd"))
    val r = s.crossJoin(broadcast(tot))
      .select(col("idx"), (col("nd") * col("n") - col("t")).as("r"))
    val den = r.agg(sum(col("r") * col("r")).as("den"))
    val lags = r.sparkSession.range(1, maxLag + 1).select(col("id").cast(IntegerType).as("lag"))
    val a = r.select(col("idx"), col("r").as("ra"))
    val b = r.select(col("idx").as("bidx"), col("r").as("rb"))
    a.crossJoin(broadcast(lags))
      .join(b, col("bidx") === col("idx") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ra") * col("rb")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        round(col("num").cast(DoubleType) / col("den") * 1e6, 0)
          .cast(LongType).as("acf_micro"))
      .orderBy(col("lag"))
  }

  /** Ljung–Box portmanteau test on the daily series — is the series
    * white noise ACROSS the first `maxLag` autocorrelations jointly?
    * [[acf]] reads one lag at a time and [[durbinWatson]] only lag 1;
    * Q = n(n+2)·Σ_{k≤m} ρ_k²/(n−k) (χ² at df = m under the null) is
    * the standard "any structure at all?" gate before trusting a
    * residual series. Built ON the published [[acf]] contract: ρ_k
    * enters as the micro-rounded acf_micro/1e6 — already
    * hash-matched across engines — and each lag's term is
    * nano-rounded pre-sum (m-bounded fold, order-free); Q is one
    * fixed-shape IEEE expression, 6dp. Lags with no pairs (k ≥ n)
    * drop out of [[acf]] and therefore out of Q; m_lags reports the
    * count actually used.
    *
    * Scale shape: [[acf]]'s — one daily aggregation, then
    * series-sized arithmetic; the Q rollup is m rows.
    *
    * @return (m_lags, n_days, dof, q_stat) — q_stat 6dp */
  def ljungBox(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val a = acf(events, maxLag)
    val nd = dailySeries(events).agg(count(lit(1)).as("n_days"))
    def d(c: Column) = c.cast(DoubleType)
    val rho = d(col("acf_micro")) / lit(1e6)
    val terms = a.crossJoin(broadcast(nd))
      .select(
        round(rho * rho / (d(col("n_days")) - d(col("lag"))) * lit(1e9), 0)
          .cast(LongType).as("term_nano"))
    // n_days rides in from the one-row dailySeries total, NOT via
    // max() over the per-lag terms — a series with days but zero
    // usable lags (e.g. a 1-day series) has an EMPTY terms relation,
    // and max-over-empty would misreport n_days = 0.
    terms.groupBy()
      .agg(count(lit(1)).as("m_lags"),
        coalesce(sum(col("term_nano")), lit(0L)).as("tsum"))
      .crossJoin(broadcast(nd))
      .select(col("m_lags"), col("n_days"), col("m_lags").as("dof"),
        round(when(col("m_lags") === 0L, 0.0).otherwise(
          d(col("n_days")) * (d(col("n_days")) + 2.0) *
            d(col("tsum")) / lit(1e9)), 6).as("q_stat"))
  }

  /** Hurst exponent of the daily series by rescaled-range (R/S)
    * analysis — LONG-MEMORY detection: H ≈ 0.5 is a random walk,
    * H > 0.5 persistent trends (load grows for weeks at a time),
    * H < 0.5 mean reversion. The complement of [[acf]]'s fixed-lag
    * view and [[ljungBox]]'s joint test: R/S reads dependence at
    * EVERY horizon via log-log scaling across dyadic windows.
    *
    * Per window size w: the series splits into consecutive COMPLETE
    * w-day blocks; each block's mean-cleared scaled residuals
    * r_t = w·x_t − T (exact longs, the [[dailySeries]] discipline)
    * cumulate to Z_k with Z_w = 0 by construction, and
    * R/S = (max Z − min Z)·√w / √(Σr²) — one fixed-shape IEEE
    * expression per block, micro-rounded pre-average (block-count-
    * bounded fold); zero-variance blocks are excluded-and-counted.
    * H is the OLS slope of ln(avg R/S) on ln(w), with the ln(w)
    * constants injected from ONE Scala table into both engines (the
    * periodogram discipline) and ln(avg R/S) micro-rounded per
    * window, so the five co-moment sums are exact longs and the
    * slope is a single long-ratio division. Fewer than 2 usable
    * window points (or a degenerate denominator) reports H = 0.
    *
    * Scale shape: the raw stream collapses to daily counts map-side
    * first; everything after runs on days × |windows| rows.
    *
    * @return one row per window: (wsize, n_blocks, avg_rs, hurst) —
    *         avg_rs/hurst 6dp, hurst repeated across rows */
  def hurstRS(events: DataFrame,
      windows: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(windows.size >= 2 && windows.forall(_ >= 2),
      s"hurstRS needs >= 2 window sizes of >= 2 days, got $windows")
    val s = dailySeries(events)
    val spark = s.sparkSession
    import spark.implicits._
    // ONE constant table feeds both engines' ln(w) values
    val wdf = broadcast(windows.map(w =>
      (w.toLong, math.round(math.log(w.toDouble) * 1e6)))
      .toDF("w", "lnw_micro"))
    val blocks = s.crossJoin(wdf)
      .select(col("w"), col("lnw_micro"), col("idx"), col("n"),
        expr("idx div w").as("blk"))
    val bTot = blocks.groupBy("w", "blk")
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("t"))
      .filter(col("cnt") === col("w"))
    val r = blocks.join(bTot, Seq("w", "blk"))
      .select(col("w"), col("lnw_micro"), col("blk"), col("idx"),
        (col("w") * col("n") - col("t")).as("r"))
    val wCum = Window.partitionBy("w", "blk").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = r.withColumn("z", sum(col("r")).over(wCum))
    def d(c: Column) = c.cast(DoubleType)
    val perBlock = cum.groupBy("w", "lnw_micro", "blk").agg(
        (max(col("z")) - min(col("z"))).as("rng"),
        sum(col("r") * col("r")).as("sr2"))
      .select(col("w"), col("lnw_micro"),
        when(col("sr2") > 0L,
          round(d(col("rng")) * sqrt(d(col("w"))) / sqrt(d(col("sr2"))) *
            lit(1e6), 0).cast(LongType)).as("rs_micro"))
    val perW = perBlock.groupBy("w", "lnw_micro").agg(
        count(col("rs_micro")).as("n_blocks"),
        sum(col("rs_micro")).as("sum_rs"))
      .withColumn("avg_rs",
        when(col("n_blocks") > 0L && col("sum_rs") > 0L,
          d(col("sum_rs")) / d(col("n_blocks")) / lit(1e6)))
      .withColumn("lnrs_micro",
        when(col("avg_rs").isNotNull,
          round(log(col("avg_rs")) * lit(1e6), 0).cast(LongType)))
    val pts = perW.filter(col("lnrs_micro").isNotNull)
      .agg(count(lit(1)).as("np"),
        sum(col("lnw_micro")).as("su"), sum(col("lnrs_micro")).as("sv"),
        sum(col("lnw_micro") * col("lnw_micro")).as("suu"),
        sum(col("lnw_micro") * col("lnrs_micro")).as("suv"))
    val den = col("np") * col("suu") - col("su") * col("su")
    val hurst = pts.select(
      round(when(col("np") < 2L || den === 0L, 0.0)
        .otherwise(d(col("np") * col("suv") - col("su") * col("sv")) /
          d(den)), 6).as("hurst"))
    perW.crossJoin(broadcast(hurst))
      .select(col("w").as("wsize"), col("n_blocks"),
        round(coalesce(col("avg_rs"), lit(0.0)), 6).as("avg_rs"),
        col("hurst"))
  }

  /** EWMA smoothing of the daily series with α = 1/2 over a bounded
    * `window`-day tail. α = 1/2 makes every weight an exact power of
    * two — `w_i = 2^(window−1−i)` for lag i — so numerator and
    * denominator are exact longs; series edges renormalize over the
    * lags that exist (the standard adjusted/bias-corrected EWMA).
    * The lag pairing is the same dense-index equi-join as [[acf]].
    *
    * @return (d, n, ewma_micro) ordered by date.
    */
  def ewma(events: DataFrame, window: Int = 8): DataFrame = {
    val s = dailySeries(events)
    val lags = s.sparkSession.range(0, window)
      .select(col("id").cast(IntegerType).as("lag"),
        pow(lit(2.0), lit(window - 1) - col("id")).cast(LongType).as("w"))
    val src = s.select(col("idx").as("sidx"), col("n").as("sn"))
    s.select(col("d"), col("idx"), col("n"))
      .crossJoin(broadcast(lags))
      .join(src, col("sidx") === col("idx") - col("lag"))
      .groupBy(col("d"), col("n"))
      .agg(sum(col("sn") * col("w")).as("num"), sum(col("w")).as("den"))
      .select(col("d"), col("n"),
        round(col("num").cast(DoubleType) / col("den") * 1e6, 0)
          .cast(LongType).as("ewma_micro"))
      .orderBy(col("d"))
  }

  /** Fisher's dispersion test per series — IS the daily count
    * Poisson, or bursty? The variance-to-mean ratio (VMR = 1 under
    * Poisson; > 1 overdispersed = flash-crowd/bot bursts, < 1
    * underdispersed = rate-limited/scheduled traffic) plus the index
    * of dispersion D = Σ(x−x̄)²/x̄ (χ² at df = n−1 under the null) —
    * the distributional companion to [[durbinWatson]]'s serial
    * structure and [[theilSen]]'s trend: a series can be flat and
    * uncorrelated yet still non-Poisson.
    *
    * The daily series is DENSIFIED per series across that series'
    * observed [min day, max day] span — zero-event days enter as
    * x = 0 (a Poisson dispersion test on a zero-truncated series
    * biases VMR and D downward-blind for sparse/gappy series: the
    * gaps ARE the burstiness evidence). n_days is therefore the span
    * length, not the observed-day count.
    *
    * Exactness: per-series (n_days, Σx, Σx²) are exact longs;
    * D = (n·Σx² − T²)/T and VMR = (n·Σx² − T²)/((n−1)·T) are single
    * fixed-shape IEEE divisions, 6dp. T = 0 or n < 2 reports 0.
    *
    * Scale shape: the raw stream collapses to (series, day) counts
    * map-side first; densification is one bounded sequence-explode
    * of the series-level span table (series × span-days rows) plus
    * one series+day left join; everything after is a series-keyed
    * rollup of three longs.
    *
    * @return (series, n_days, mean, vmr, d_stat, dof) — 6dp */
  def dispersionTest(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val s0 = events.groupBy(col(seriesCol).cast("string").as("series"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("x"))
    val dense = s0.groupBy("series")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("series"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val s = dense.join(s0, Seq("series", "d"), "left")
      .select(col("series"), coalesce(col("x"), lit(0L)).as("x"))
    val agg = s.groupBy("series").agg(count(lit(1)).as("n_days"),
      sum(col("x")).as("t"), sum(col("x") * col("x")).as("sxx"))
    def d(c: Column) = c.cast(DoubleType)
    val num = col("n_days") * col("sxx") - col("t") * col("t") // exact
    agg.select(col("series"), col("n_days"),
      round(when(col("n_days") === 0L, 0.0)
        .otherwise(d(col("t")) / d(col("n_days"))), 6).as("mean"),
      round(when(col("n_days") < 2L || col("t") === 0L, 0.0)
        .otherwise(d(num) / ((d(col("n_days")) - 1.0) * d(col("t")))), 6)
        .as("vmr"),
      round(when(col("n_days") < 2L || col("t") === 0L, 0.0)
        .otherwise(d(num) / d(col("t"))), 6).as("d_stat"),
      greatest(col("n_days") - 1L, lit(0L)).as("dof"))
  }

  /** MATCH_RECOGNIZE-lite: regex pattern detection over each user's
    * time-ordered event-type sequence.
    *
    * Each user's events collapse to a character string (one letter
    * per event type, ordered by (ts, event_id) — event_id breaks
    * timestamp ties deterministically), then plain regex counts
    * pattern occurrences: `v[^p]*p` = "a view eventually converting
    * to a purchase" (non-overlapping, leftmost; `[^p]*` cannot cross
    * a purchase so leftmost-first and leftmost-longest agree — the
    * Java-regex vs RE2 engine difference cannot show), and
    * `s.*v.*p` = the signup→view→purchase funnel as a flag.
    *
    * Scale shape: ONE shuffle on user_id; per-user state is the
    * event-initial string, bounded by that user's activity (the same
    * per-key bound sessionization carries). For pathological keys,
    * chunk by (user, week) first — the pattern here is the operator
    * contract, not a driver-side loop.
    *
    * @return (user_id, n_events, n_view_to_purchase, has_funnel).
    */
  def seqPattern(events: DataFrame): DataFrame = {
    val chr: Column = substring(col("event_type"), 1, 1)
    events
      .select(col("user_id"), struct(col("ts"), col("event_id"), chr.as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("c")), "").as("seq"))
      .select(col("user_id"),
        length(col("seq")).cast(LongType).as("n_events"),
        size(expr("regexp_extract_all(seq, 'v[^p]*p', 0)"))
          .cast(LongType).as("n_view_to_purchase"),
        col("seq").rlike("s.*v.*p").as("has_funnel"))
      .orderBy(col("user_id"))
  }

  /** Seasonality-adjusted daily anomaly scores: each day's count is
    * z-scored against ITS WEEKDAY's distribution (a quiet Sunday is
    * normal; the same count on a Wednesday is an outage) — the
    * day-of-week adjustment plain [[graft.ext.Curation]] z-scoring
    * misses. Engine-agreement discipline: z's numerator (c·n − t) and
    * the variance term (c·t2 − t²) are EXACT longs per weekday; the
    * one double division + sqrt at the end is identically rounded on
    * both engines, then micro-rounded. Two tiny aggregates over the
    * ~N-day daily series — at any raw-event scale the work is one
    * day-keyed count shuffle.
    *
    * @return (d, n, dow, z_micro, is_anomaly) ordered by date.
    */
  def seasonalAnomalies(events: DataFrame,
      zThreshMicro: Long = 2000000L): DataFrame = {
    val s = dailySeries(events).withColumn("dow", dayofweek(col("d")))
    val stats = s.groupBy("dow").agg(count(lit(1)).as("c"),
      sum(col("n")).as("t"), sum(col("n") * col("n")).as("t2"))
    s.join(stats, "dow")
      .withColumn("num", col("c") * col("n") - col("t"))
      .withColumn("den", col("c") * col("t2") - col("t") * col("t"))
      .withColumn("z_micro",
        when(col("den") > 0,
          round(col("num").cast("double") / sqrt(col("den").cast("double")) * 1e6, 0)
            .cast(LongType))
          .otherwise(lit(0L)))
      .select(col("d"), col("n"), col("dow"), col("z_micro"),
        (abs(col("z_micro")) >= zThreshMicro).as("is_anomaly"))
      .orderBy(col("d"))
  }

  /** Theil–Sen robust trend per series — the outlier-proof
    * complement to [[holtForecast]]: the slope estimate is the MEDIAN
    * of all pairwise slopes (xⱼ−xᵢ)/(dⱼ−dᵢ) over day indices (up to
    * ~29% corrupted days cannot move it — one crawler outage day
    * wrecks a least-squares slope but not this one), intercept the
    * median residual xᵢ·10⁶ − slope·dᵢ at the fitted slope.
    *
    * Exactness contract: each pairwise slope is ONE IEEE division of
    * exact longs (identical in any engine); medians are order
    * statistics of identically-sorted doubles (even-count median is
    * the mean of the two middles — same two doubles, same mean);
    * residuals use the already-rounded integer slope so they are
    * exact longs. Day gaps are handled by indexing on datediff, not
    * row number.
    *
    * Scale shape: one (series, day) count shuffle, then the n²/2
    * slope set builds INSIDE a per-row array expression over the
    * bounded per-series history (90 days → ~4 k slopes per row) —
    * no pairwise join, no window.
    *
    * @return (series, n_days, slope_micro, intercept_micro) */
  def theilSen(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val daily = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("pts"))
      .select(col("series"), size(col("pts")).as("n_days"),
        expr("transform(pts, p -> datediff(p.day, pts[0].day))").as("idx"),
        expr("transform(pts, p -> p.x)").as("xs"))
      .select(col("series"), col("n_days"),
        // guard size<2: Spark's sequence(0, -1) DESCENDS instead of
        // emitting empty (the q_rouge sequence lesson) — a 1-day
        // series must yield zero slopes, not garbage indices
        expr("""CASE WHEN size(xs) < 2 THEN array()
          ELSE array_sort(flatten(transform(sequence(0, size(xs) - 2),
            i -> transform(sequence(i + 1, size(xs) - 1),
              j -> CAST(xs[j] - xs[i] AS DOUBLE) / (idx[j] - idx[i]))))) END""")
          .as("slopes"),
        col("idx"), col("xs"))
      .select(col("series"), col("n_days"), col("idx"), col("xs"),
        when(size(col("slopes")) === 0, lit(0L)).otherwise(
          round(when(size(col("slopes")) % 2 === 1,
              expr("slopes[(size(slopes) - 1) div 2]"))
            .otherwise((expr("slopes[size(slopes) div 2 - 1]") +
              expr("slopes[size(slopes) div 2]")) / 2.0) * 1e6, 0)
            .cast(LongType)).as("slope_micro"))
      .select(col("series"), col("n_days"), col("slope_micro"),
        expr("""array_sort(transform(sequence(0, size(xs) - 1),
          i -> xs[i] * 1000000 - slope_micro * idx[i]))""").as("res"))
      .select(col("series"), col("n_days"), col("slope_micro"),
        when(size(col("res")) % 2 === 1,
            expr("res[(size(res) - 1) div 2]"))
          .otherwise(round((expr("res[size(res) div 2 - 1]") +
              expr("res[size(res) div 2]")).cast(DoubleType) / 2.0, 0)
            .cast(LongType))
          .as("intercept_micro"))
  }

  /** The (period, phase) → micro cos/sin factor table shared by
    * [[periodogram]] and its oracle generator: ONE Scala computation
    * of the transcendentals, micro-rounded, consumed literally by
    * both engines (the q_random_walks constant-coupling lesson —
    * DuckDB's libm replaying cos() could drift an ulp; an injected
    * VALUES list cannot). Size Σ_{p} p ≤ 105 rows for periods ≤ 14. */
  def periodogramFactors(minPeriod: Int, maxPeriod: Int)
      : Seq[(Int, Int, Long, Long)] =
    for (p <- minPeriod to maxPeriod; m <- 0 until p) yield {
      val theta = 2.0 * math.Pi * m / p
      (p, m, math.round(math.cos(theta) * 1e6),
        math.round(math.sin(theta) * 1e6))
    }

  /** Periodogram over the per-series daily volume — dominant-cycle
    * detection ("is this source's crawl volume weekly-periodic?"):
    * DFT power at each candidate period P,
    * power(P) ∝ Sc² + Ss² with Sc = Σ_t r_t·cos(2πt/P) over the
    * mean-cleared scaled residuals r_t = N·x_t − T (the [[acf]]
    * residual form), normalized by N·Σr² so the statistic lands in
    * [0, 2] regardless of scale. The per-series max-power period is
    * flagged `is_peak` (ties flag all).
    *
    * Exactness: cos/sin factors come micro-rounded from the SHARED
    * [[periodogramFactors]] table; each term (r·factor) div 1e6 is a
    * truncating long product both engines replay; Sc/Ss are
    * order-free long sums; the power ratio is one fixed-shape double
    * expression micro-rounded. Constant series (Σr² = 0) score 0.
    * Exactness bound: the pre-division product r·factor needs
    * |r| = |N·x_t − T| < 2⁶³/1e6 ≈ 9·10¹², i.e. days × peak-daily-
    * volume < ~10¹² — comfortable for daily series (a 3-year series
    * holds to ~10⁹ events/day); pre-aggregate to coarser buckets
    * beyond that.
    *
    * Scale shape: ONE corpus-proportional stage — the (series, day)
    * count shuffle (map-side combined). Everything after runs on the
    * series×days table crossed with ≤13 candidate periods and joined
    * to the ≤105-row broadcast factor table; series-bounded
    * aggregates finish it. @return (series, period, sc, ss,
    * power_micro, is_peak) */
  def periodogram(events: DataFrame, seriesCol: String = "event_type",
      minPeriod: Int = 2, maxPeriod: Int = 14,
      tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val base = daily.groupBy("series")
      .agg(min(col("day")).as("d0"), sum(col("x")).as("t"),
        count(lit(1)).as("nd"))
    val r = daily.join(broadcast(base), "series")
      .select(col("series"),
        datediff(col("day"), col("d0")).as("idx"),
        (col("nd") * col("x") - col("t")).as("r"))
    val den = r.groupBy("series").agg(sum(col("r") * col("r")).as("den"))
      .join(broadcast(base.select(col("series"), col("nd"))), "series")
    val periods = (minPeriod to maxPeriod).toDF("p")
    val factors = periodogramFactors(minPeriod, maxPeriod)
      .toDF("p", "m", "cos_micro", "sin_micro")
    val terms = r.crossJoin(broadcast(periods))
      .select(col("series"), col("p"), pmod(col("idx"), col("p")).as("m"),
        col("r"))
      .join(broadcast(factors), Seq("p", "m"))
      .select(col("series"), col("p"),
        expr("(r * cos_micro) div 1000000").as("tc"),
        expr("(r * sin_micro) div 1000000").as("tsn"))
    val sums = terms.groupBy("series", "p")
      .agg(sum(col("tc")).as("sc"), sum(col("tsn")).as("ss"))
    val power = sums.join(broadcast(den), "series")
      .select(col("series"), col("p").as("period"), col("sc"), col("ss"),
        when(col("den") === 0L, 0L).otherwise(
          round((col("sc").cast(DoubleType) * col("sc").cast(DoubleType) +
            col("ss").cast(DoubleType) * col("ss").cast(DoubleType)) /
            (col("den").cast(DoubleType) * col("nd").cast(DoubleType))
            * 1e6, 0).cast(LongType)).as("power_micro"))
    val peak = power.groupBy(col("series").as("ps"))
      .agg(max(col("power_micro")).as("pmax"))
    power.join(broadcast(peak), col("series") === col("ps"))
      .select(col("series"), col("period"), col("sc"), col("ss"),
        col("power_micro"),
        (col("power_micro") === col("pmax")).as("is_peak"))
  }

  /** Median/MAD robust outlier days per series — the heavy-tail-safe
    * twin of the z-score family ([[seasonalAnomalies]] uses mean/σ,
    * which an extreme day inflates until it masks ITSELF; median and
    * MAD have 50% breakdown, so the outage day stays flagged): robust
    * z = 0.6745·(x − median)/MAD (Iglewicz–Hoaglin modified z-score),
    * flagged at |z| ≥ 3.5.
    *
    * Exactness contract: median and MAD are computed in integer
    * micro-units with `(a+b) div 2` even-count midpoints (nonneg
    * longs — truncation identical cross-engine); the robust z is ONE
    * double expression of exact longs, micro-rounded. MAD = 0
    * (≥ half the days share the median) scores 0 at the median and
    * ±10⁹ off it by convention — deterministic, no infinities.
    *
    * Scale shape: one (series, day) count shuffle, per-series medians
    * inside bounded array expressions, one posexplode back to days —
    * no windows. @return (series, day, x, rz_micro, is_outlier) */
  def madOutliers(events: DataFrame, threshMicro: Long = 3500000L,
      seriesCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val daily = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    def medianOf(arr: String): String =
      s"""CASE WHEN size($arr) % 2 = 1 THEN $arr[(size($arr) - 1) div 2]
         ELSE ($arr[size($arr) div 2 - 1] + $arr[size($arr) div 2]) div 2 END"""
    daily.groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("pts"))
      .select(col("series"), col("pts"),
        expr("array_sort(transform(pts, p -> p.x * 1000000))").as("xs"))
      .select(col("series"), col("pts"),
        expr(medianOf("xs")).as("med"))
      .select(col("series"), col("pts"), col("med"),
        expr("array_sort(transform(pts, p -> abs(p.x * 1000000 - med)))")
          .as("devs"))
      .select(col("series"), col("pts"), col("med"),
        expr(medianOf("devs")).as("mad"))
      .select(col("series"), col("med"), col("mad"),
        explode(col("pts")).as("p"))
      .select(col("series"), col("p.day").as("day"), col("p.x").as("x"),
        when(col("mad") === 0L,
            when(col("p.x") * 1000000L === col("med"), lit(0L))
              .otherwise(signum((col("p.x") * 1000000L - col("med"))
                .cast(DoubleType)).cast(LongType) * 1000000000L))
          .otherwise(round(lit(0.6745) *
              (col("p.x") * 1000000L - col("med")).cast(DoubleType) /
              col("mad").cast(DoubleType) * 1e6, 0).cast(LongType))
          .as("rz_micro"))
      .withColumn("is_outlier", abs(col("rz_micro")) >= threshMicro)
  }

  /** Holt double-exponential smoothing per series — the capacity/
    * volume forecast a pipeline's ingest planning needs (EWMA tracks
    * level only; Holt carries a TREND term, so a steadily-growing
    * source extrapolates instead of lagging): per series, fold the
    * ordered daily counts through lₜ = ⌊(α·xₜ·1000 + (1000−α)(lₜ₋₁+
    * bₜ₋₁))/1000⌋, bₜ = ⌊(β(lₜ−lₜ₋₁) + (1000−β)bₜ₋₁)/1000⌋ (weights
    * in permille, state in milli-units), forecast ŷ_{T+h} = l_T +
    * h·b_T.
    *
    * Exactness contract: permille weights and milli state keep every
    * update numerator < 2⁵³ (x ≤ ~10⁹/day/series), so the one double
    * division per term is exact-rational and floor() lands
    * identically in any engine (floor-toward−∞ on both, trend may go
    * negative); the fold order is the sorted day order — no
    * order-sensitivity to hide. The DuckDB oracle replays the
    * recurrence as a recursive CTE.
    *
    * Scale shape: one (series, day) count shuffle (map-side
    * combined), then one series-keyed collect into a bounded array
    * (series length = days of history — hundreds, not corpus-sized)
    * folded per row. No windows, no iteration shuffles — the
    * sequential recurrence lives inside a per-row array fold.
    *
    * @return (series, n_days, level_milli, trend_milli,
    *         f1_milli .. f{horizon}_milli) */
  def holtForecast(events: DataFrame, alphaPermille: Int = 300,
      betaPermille: Int = 100, horizon: Int = 3,
      seriesCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val a = alphaPermille; val bp = betaPermille
    def fdiv(n: Column): Column =
      floor(n.cast(DoubleType) / 1000.0).cast(LongType)
    val daily = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val folded = daily.groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("pts"))
      .select(col("series"), size(col("pts")).as("n_days"),
        aggregate(
          expr("slice(pts, 2, greatest(size(pts) - 1, 0))"),
          struct((element_at(col("pts"), 1)("x") * 1000L).as("l"),
            lit(0L).as("b")),
          (acc, p) => {
            val lNew = fdiv(lit(a.toLong) * p("x") * 1000L +
              lit(1000L - a) * (acc("l") + acc("b")))
            struct(lNew.as("l"),
              fdiv(lit(bp.toLong) * (lNew - acc("l")) +
                lit(1000L - bp) * acc("b")).as("b"))
          }).as("st"))
    val fcols = (1 to horizon).map(h =>
      (col("st")("l") + col("st")("b") * h.toLong).as(s"f${h}_milli"))
    folded.select(Seq(col("series"), col("n_days"),
      col("st")("l").as("level_milli"), col("st")("b").as("trend_milli")) ++
      fcols: _*)
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per series — the
    * seasonality [[holtForecast]] cannot express (weekly traffic
    * shape, weekday/weekend cycles): alongside level and trend, a
    * rotating `period`-slot seasonal state
    * sₜ = γ(xₜ−lₜ) + (1−γ)s₍ₜ₋ₘ₎ folds with the same integer-milli /
    * floor-division exactness contract as Holt (all three updates are
    * exact-rational; floor-toward−∞ lands identically in any engine —
    * seasonal terms and trend may go negative). Initialization is the
    * standard one: level = mean of the first season, seasonal slots =
    * the first season's deviations from it, trend 0; series shorter
    * than one full season are excluded (no seasonal state to
    * estimate). Forecast h = level + h·trend + the h-th upcoming
    * seasonal slot.
    *
    * Scale shape: identical to Holt — one (series, day) count shuffle
    * (map-side combined), one series-keyed bounded collect, the
    * recurrence inside a per-row array fold; the seasonal state adds
    * `period` longs per series, nothing corpus-proportional. The
    * DuckDB oracle replays the recurrence as a recursive CTE carrying
    * the seasonal list.
    *
    * @return (series, n_days, level_milli, trend_milli,
    *         f1_milli .. f{horizon}_milli) */
  def holtWintersForecast(events: DataFrame, period: Int = 7,
      alphaPermille: Int = 300, betaPermille: Int = 100,
      gammaPermille: Int = 200, horizon: Int = 3,
      seriesCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(horizon <= period, "forecast slots rotate once per period")
    val m = period
    val folded = dailyCounts(events, seriesCol, tsCol).groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("pts"))
      .filter(size(col("pts")) > m)
      .transform(withHwState("pts", m, alphaPermille.toLong,
        betaPermille.toLong, gammaPermille.toLong))
    val fcols = (1 to horizon).map(h =>
      (col("st")("l") + col("st")("b") * h.toLong +
        element_at(col("st")("sl"), ((h - 1) % m) + 1)).as(s"f${h}_milli"))
    folded.select(Seq(col("series"), size(col("pts")).as("n_days"),
      col("st")("l").as("level_milli"), col("st")("b").as("trend_milli")) ++
      fcols: _*)
  }

  /** Daily counts DENSIFIED to a contiguous calendar range per
    * series (gaps filled with x=0): the Holt–Winters fold rotates the
    * seasonal slot array once per ROW, so a missing calendar day
    * would silently shift the weekly alignment for the rest of the
    * series and corrupt both the fit and the forecast slot mapping.
    * The calendar explode is series-history-sized (days, not events)
    * and the left join runs on the already-aggregated tiny table. */
  /** Seasonal strength of the weekly cycle per series — HOW MUCH of
    * the daily series' variance the day-of-week profile explains
    * (the one-number screen before reaching for [[holtWintersForecast]]
    * or the seasonal anomaly scorer): strength =
    * max(0, 1 − SSE/SST) with SSE the within-weekday sum of squares
    * and SST the total — an R² against the weekday-means model.
    *
    * Exactness: per-weekday (c, Σx, Σx²) and the series totals are
    * exact longs; each weekday's SSE term (c·Σx² − (Σx)²)/c and the
    * single SST term (n·Σx² − T²)/n round to NANO longs pre-sum; the
    * strength is one fixed-shape expression over the exact sums,
    * 6dp (T² stays long-exact while a series' yearly event total is
    * < ~3·10⁹ — beyond that, pre-scale the daily counts). A constant series (SST = 0) reports 0 — no variance, no
    * seasonality claim. Raw observed days (the [[cusumChangepoint]]
    * convention — a gap day is absent, not zero).
    *
    * Scale shape: the corpus is touched once by the daily
    * aggregation; everything after is weekday-bounded (≤ 7 rows per
    * series).
    *
    * @return (series, n_days, strength) */
  def seasonalStrength(events: DataFrame,
      seriesCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val s = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("x"))
    val byDow = s.groupBy(col("series"), dayofweek(col("d")).as("dow"))
      .agg(count(lit(1)).as("c"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    def dd(c: Column) = c.cast(DoubleType)
    def nano(x: Column) = round(x * 1e9, 0).cast(LongType)
    val sse = byDow.select(col("series"), col("c"), col("sx"), col("sxx"),
        when(col("c") === 0L, 0L).otherwise(
          nano(dd(col("c") * col("sxx") - col("sx") * col("sx")) /
            dd(col("c")))).as("sse_nano"))
      .groupBy("series").agg(
        sum(col("c")).as("n_days"), sum(col("sx")).as("t"),
        sum(col("sxx")).as("sxx"), sum(col("sse_nano")).as("sse_nano"))
    val sst = nano(dd(col("n_days") * col("sxx") - col("t") * col("t")) /
      dd(col("n_days")))
    sse.select(col("series"), col("n_days"),
      round(when(sst <= 0L, 0.0).otherwise(
        greatest(lit(0.0), lit(1.0) -
          dd(col("sse_nano")) / dd(sst))), 6).as("strength"))
  }

  /** Page–Hinkley upward-shift detector per series over the daily
    * series — the running-minimum refinement of [[cusumChangepoint]]
    * (CUSUM's |S_t| peaks once per series; PH_t = m_t − min_{s≤t} m_s
    * resets after every downward excursion, so evidence for an UP
    * shift accumulates from the most recent low, the classic
    * sequential-detection form with δ = 0): m_t = Σ_{s≤t}(x_s − x̄)
    * over observed days ([[cusumChangepoint]]'s raw-day convention —
    * the densified variant is [[mannKendall]]'s job).
    *
    * Exactness: the statistic is scaled by N (r_s = N·x_s − T) so the
    * cumulative sum, running min, and PH are EXACT longs end-to-end;
    * the peak flag compares exact longs. The argmax is scale-
    * invariant. A series with no positive excursion (monotone
    * non-increasing evidence) flags no peak.
    *
    * Scale shape: the corpus is touched once by the daily
    * aggregation (map-side combined); every window runs per series
    * over the days-sized table.
    *
    * @return (series, d, n, ph_scaled, is_peak) */
  def pageHinkley(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val s = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    val tot = s.groupBy("series")
      .agg(sum(col("n")).as("t"), count(lit(1)).as("nd"))
    val dev = s.join(broadcast(tot), Seq("series"))
      .select(col("series"), col("d"), col("n"),
        (col("nd") * col("n") - col("t")).as("r"))
    val wCum = Window.partitionBy("series").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ph = dev.withColumn("m", sum(col("r")).over(wCum))
      .withColumn("ph_scaled", col("m") - min(col("m")).over(wCum))
    ph.withColumn("peak",
        max(col("ph_scaled")).over(Window.partitionBy("series")))
      .select(col("series"), col("d"), col("n"), col("ph_scaled"),
        (col("ph_scaled") === col("peak") && col("peak") > 0L).as("is_peak"))
  }

  /** Mann–Kendall trend test per series over the densified daily
    * series — the NONPARAMETRIC monotone-trend detector (is volume
    * drifting up, regardless of distribution or outliers?) that
    * complements [[theilSen]]'s slope estimate with a significance
    * readout: S = Σ_{i<j} sgn(x_j − x_i) over all day pairs,
    * Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 (tie-corrected —
    * the densified zero-gap days tie heavily and the correction is
    * what keeps sparse series honest), z continuity-corrected by ∓1.
    *
    * Exactness: S, the pair count, and both variance terms are exact
    * long sums; z is one fixed-shape IEEE expression over them, 6dp.
    * Series with Var ≤ 0 (constant series) report z = 0 / 'none'.
    *
    * Scale shape: the pair join runs on the DAYS-sized series table
    * (calendar-bounded — n days ⇒ n²/2 pairs per series, never
    * corpus-proportional); the corpus itself is touched once by the
    * dailyCounts aggregation, map-side combined.
    *
    * @return (series, n_days, s, z, trend) — trend at |z| > 1.96 */
  def mannKendall(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val d = dailyCounts(events, seriesCol, tsCol)
    val a = d.select(col("series"), col("day").as("di"), col("x").as("xi"))
    val b = d.select(col("series"), col("day").as("dj"), col("x").as("xj"))
    val s = a.join(b, Seq("series")).filter(col("di") < col("dj"))
      .groupBy("series").agg(
        sum(when(col("xj") > col("xi"), 1L)
          .when(col("xj") < col("xi"), -1L).otherwise(0L)).as("s"))
    val ties = d.groupBy(col("series"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy("series").agg(
        sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
          .as("tie18"))
    val joined = ties.join(s, Seq("series"))
    val n = col("n_days")
    val var18 = n * (n - 1L) * (lit(2L) * n + 5L) - col("tie18")
    val varS = var18.cast(DoubleType) / 18.0
    val z = when(col("s") > 0L, (col("s").cast(DoubleType) - 1.0) / sqrt(varS))
      .when(col("s") < 0L, (col("s").cast(DoubleType) + 1.0) / sqrt(varS))
      .otherwise(0.0)
    joined.select(col("series"), col("n_days"), col("s"),
      round(when(var18 <= 0L, 0.0).otherwise(z), 6).as("z"),
      when(var18 <= 0L, "none")
        .when(z > 1.96, "increasing")
        .when(z < -1.96, "decreasing")
        .otherwise("none").as("trend"))
  }

  private def dailyCounts(events: DataFrame, seriesCol: String,
      tsCol: String): DataFrame = {
    val raw = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint() // span pass + join pass over a days-sized table
    val cal = raw.groupBy("series")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("series"), explode(
        sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val out = cal.join(raw, Seq("series", "day"), "left")
      .select(col("series"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(raw)
    out
  }

  /** Append the Holt–Winters folded state `st` (l, b, sl) computed
    * over the (day, x) struct array in `ptsCol` — shared by the
    * forecaster and the backtest so both run the IDENTICAL
    * recurrence. */
  private def withHwState(ptsCol: String, m: Int, a: Long, bp: Long,
      g: Long)(df: DataFrame): DataFrame = {
    def fdiv(n: Column): Column =
      floor(n.cast(DoubleType) / 1000.0).cast(LongType)
    df.withColumn("__l0",
        floor(aggregate(expr(s"slice($ptsCol, 1, $m)"), lit(0L),
            (acc, p) => acc + p("x") * 1000L).cast(DoubleType) / m.toDouble)
          .cast(LongType))
      .withColumn("__s0",
        expr(s"transform(slice($ptsCol, 1, $m), p -> p.x * 1000 - __l0)"))
      .withColumn("st",
        aggregate(
          expr(s"slice($ptsCol, ${m + 1}, size($ptsCol) - $m)"),
          struct(col("__l0").as("l"), lit(0L).as("b"), col("__s0").as("sl")),
          (acc, p) => {
            val sOld = element_at(acc("sl"), 1)
            val lNew = fdiv(lit(a) * (p("x") * 1000L - sOld) +
              lit(1000L - a) * (acc("l") + acc("b")))
            val bNew = fdiv(lit(bp) * (lNew - acc("l")) +
              lit(1000L - bp) * acc("b"))
            val sNew = fdiv(lit(g) * (p("x") * 1000L - lNew) +
              lit(1000L - g) * sOld)
            struct(lNew.as("l"), bNew.as("b"),
              concat(slice(acc("sl"), 2, m - 1), array(sNew)).as("sl"))
          }))
      .drop("__l0", "__s0")
  }

  /** Forecast BACKTEST — the "measure, don't guess" loop for the
    * forecasting family: hold out the last `testDays` days of each
    * series, fit Holt–Winters on the rest, and score the held-out
    * days against the SEASONAL-NAIVE baseline (repeat the training
    * window's last season — the baseline MASE is defined against).
    * mase < 1 means the model earned its keep; mase ≥ 1 means ship
    * the naive repeat instead. Everything stays integer-milli exact:
    * both error sums are exact longs over the same held-out days, so
    * the ratio is one 6dp division.
    *
    * Scale shape: identical to the forecaster — one (series, day)
    * count shuffle, one bounded per-series collect, and the entire
    * split/fit/score inside per-row array expressions.
    *
    * @return (series, n_days, mae_model_milli, mae_naive_milli, mase)
    */
  def forecastBacktest(events: DataFrame, period: Int = 7,
      testDays: Int = 7, alphaPermille: Int = 300,
      betaPermille: Int = 100, gammaPermille: Int = 200,
      seriesCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(testDays <= period, "held-out horizon rotates once per period")
    val m = period; val td = testDays
    dailyCounts(events, seriesCol, tsCol).groupBy("series")
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("all_pts"))
      .filter(size(col("all_pts")) > m + td)
      .withColumn("pts", expr(s"slice(all_pts, 1, size(all_pts) - $td)"))
      .withColumn("test", expr(
        s"slice(all_pts, size(all_pts) - ${td - 1}, $td)"))
      .transform(withHwState("pts", m, alphaPermille.toLong,
        betaPermille.toLong, gammaPermille.toLong))
      .withColumn("last_season", expr(
        s"transform(slice(pts, size(pts) - ${m - 1}, $m), p -> p.x * 1000)"))
      .withColumn("model_abs", expr(
        s"aggregate(sequence(1, $td), CAST(0 AS BIGINT), (acc, h) -> " +
          s"acc + abs(st.l + h * st.b + " +
          s"element_at(st.sl, CAST((h - 1) % $m AS INT) + 1) - " +
          s"element_at(test, h).x * 1000))"))
      .withColumn("naive_abs", expr(
        s"aggregate(sequence(1, $td), CAST(0 AS BIGINT), (acc, h) -> " +
          s"acc + abs(element_at(last_season, CAST((h - 1) % $m AS INT) + 1) - " +
          s"element_at(test, h).x * 1000))"))
      .select(col("series"), size(col("all_pts")).as("n_days"),
        round(col("model_abs").cast(DoubleType) / td.toDouble, 0)
          .cast(LongType).as("mae_model_milli"),
        round(col("naive_abs").cast(DoubleType) / td.toDouble, 0)
          .cast(LongType).as("mae_naive_milli"),
        round(when(col("naive_abs") === 0L, 0.0)
          .otherwise(col("model_abs").cast(DoubleType) /
            col("naive_abs").cast(DoubleType)), 6).as("mase"))
  }

  /** Durbin–Watson statistic per series — the classic lag-1
    * autocorrelation test on the mean-cleared daily residuals:
    * DW = Σ(r_t − r_{t−1})² / Σr_t² ∈ [0, 4], ≈ 2 for white noise,
    * → 0 under positive autocorrelation (slow drifts the mean hides),
    * → 4 under negative (flapping). The single-number companion of
    * [[acf]]'s per-lag table and [[runsTest]]'s sign patterns.
    *
    * Exactness: residuals use the N-SCALED integer form r_t = N·x_t −
    * T (the [[acf]] discipline — the N² scale cancels in the ratio),
    * so numerator and denominator are EXACT longs end-to-end; DW is
    * one division, 6dp. Series with < 2 days or zero variance report
    * 0.
    *
    * Scale shape: the per-series daily reduction, then a days-sized
    * lag window per series.
    *
    * @return (series, n_days, dw) — 6dp */
  def durbinWatson(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val s = events.groupBy(col(seriesCol).as("series"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy("series")
    val wDay = Window.partitionBy("series").orderBy("d")
    val r = s
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("t", sum(col("n")).over(wAll))
      .withColumn("r", col("nd") * col("n") - col("t"))
      .withColumn("rp", lag(col("r"), 1).over(wDay))
    val agg = r.groupBy("series").agg(
      max(col("nd")).as("n_days"),
      sum(col("r") * col("r")).as("den"),
      sum(when(col("rp").isNull, 0L)
        .otherwise((col("r") - col("rp")) * (col("r") - col("rp"))))
        .as("num"))
    agg.select(col("series"), col("n_days"),
      round(when(col("n_days") < 2L || col("den") === 0L, 0.0)
        .otherwise(col("num").cast(DoubleType) /
          col("den").cast(DoubleType)), 6).as("dw"))
  }

  /** Wald–Wolfowitz runs test per series — is the daily series's
    * above/below-median sequence RANDOM, or does it clump (regimes,
    * slow drifts) or alternate (overcorrection, load-balancer
    * flapping)? The randomness check [[acf]] reads linearly and
    * [[mannKendall]] reads monotonically; runs reads SIGN PATTERNS.
    * Days are labeled above (+) / below (−) the series median (days
    * AT the median are dropped — the standard treatment); R = number
    * of sign runs; z = (R − μ)/σ with μ = 2n₁n₂/(n₁+n₂) + 1 and
    * σ² = 2n₁n₂(2n₁n₂−n₁−n₂) / ((n₁+n₂)²(n₁+n₂−1)).
    *
    * Exactness: the median is an exact value-domain order statistic
    * in DOUBLED units (the [[graft.ext.Evaluation.brownForsythe]]
    * midpoint trick); run boundaries come from a lag over the ordered
    * day window (exact long sum); μ/σ/z are one fixed-shape IEEE
    * expression, 6dp. n₁ = 0 or n₂ = 0 (or σ = 0) reports z = 0.
    *
    * Scale shape: the [[dailySeries]]-per-series reduction, then
    * everything runs on days-sized windows per series.
    *
    * @return (series, n1, n2, runs, z) — 6dp */
  def runsTest(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val s = events.groupBy(col(seriesCol).as("series"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    val wCumV = Window.partitionBy("series").orderBy("n")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("series")
    // exact doubled median of the daily counts per series
    val med = s
      .withColumn("cum", count(lit(1)).over(wCumV))
      .withColumn("nd", count(lit(1)).over(wAll))
      .groupBy("series").agg(
        min(when(col("cum") >= expr("(nd + 1) div 2"), col("n"))).as("v_lo"),
        min(when(col("cum") >= expr("nd div 2 + 1"), col("n"))).as("v_hi"))
      .select(col("series"), (col("v_lo") + col("v_hi")).as("med2"))
    val signed = s.join(med, Seq("series"))
      .filter(lit(2L) * col("n") =!= col("med2"))
      .withColumn("sign", (lit(2L) * col("n") > col("med2")).cast(LongType))
    val wDay = Window.partitionBy("series").orderBy("d")
    val runs = signed
      .withColumn("brk", when(lag(col("sign"), 1).over(wDay).isNull ||
        lag(col("sign"), 1).over(wDay) =!= col("sign"), 1L).otherwise(0L))
      .groupBy("series").agg(
        sum(col("sign")).as("n1"),
        sum(lit(1L) - col("sign")).as("n2"),
        sum(col("brk")).as("runs"))
    def d(c: String) = col(c).cast(DoubleType)
    val nn = d("n1") + d("n2")
    val mu = lit(2.0) * d("n1") * d("n2") / nn + 1.0
    val sig2 = lit(2.0) * d("n1") * d("n2") *
      (lit(2.0) * d("n1") * d("n2") - d("n1") - d("n2")) /
      (nn * nn * (nn - 1.0))
    runs.select(col("series"), col("n1"), col("n2"), col("runs"),
      round(when(col("n1") === 0L || col("n2") === 0L, 0.0)
        .otherwise(when(sig2 <= 0.0, 0.0)
          .otherwise((d("runs") - mu) / sqrt(sig2))), 6).as("z"))
  }

  /** Single change-point detection per series by least-squares binary
    * segmentation (depth 1 — the first split PELT/BinSeg would make):
    * the day t* that MINIMIZES pooled SSE when the daily series is
    * modeled as two constant segments, reported with the variance
    * explained. [[cusumChangepoint]] flags the peak of the cumsum —
    * the mean-shift heuristic; this is the exact SSE-optimal split of
    * the same series, the readout a "did the feed change level, and
    * where" alert actually wants.
    *
    * Exactness: prefix sums Σy and Σy² are exact longs from ordered
    * day windows (Σy² bounds as in the stats family — daily counts
    * through ~3·10⁶/day on 10⁶-day series); each candidate's gain
    * SSE_total − SSE_left − SSE_right is a fixed-shape IEEE
    * expression over those longs, MICRO-rounded before the argmax so
    * the winner (earliest day on ties) is engine-independent.
    *
    * Scale shape: the [[dailySeries]] reduction per series (100 TB of
    * events → one row per (series, day) map-side), then windows and
    * the argmax run on the days-sized table — the [[cusumChangepoint]]
    * bound. Series with a single day emit nothing (no split exists).
    *
    * @return (series, n_days, cp_d, n_left, mean_left, mean_right,
    *         gain) — cp_d the LAST day of the left segment; 6dp */
  def changePoint(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val s = events.groupBy(col(seriesCol).as("series"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy("series").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("series")
    val pre = s
      .withColumn("i", count(lit(1)).over(wCum))
      .withColumn("cs", sum(col("n")).over(wCum))
      .withColumn("css", sum(col("n") * col("n")).over(wCum))
      .withColumn("nd", count(lit(1)).over(wAll))
      .withColumn("ts_", sum(col("n")).over(wAll))
      .withColumn("tss", sum(col("n") * col("n")).over(wAll))
    def d(c: String) = col(c).cast(DoubleType)
    val sseL = d("css") - d("cs") * d("cs") / d("i")
    val rs = d("ts_") - d("cs")
    val sseR = (d("tss") - d("css")) - rs * rs / (d("nd") - d("i"))
    val sseT = d("tss") - d("ts_") * d("ts_") / d("nd")
    val cand = pre.filter(col("i") < col("nd"))
      .select(col("series"), col("d"), col("i"), col("cs"), col("nd"),
        col("ts_"),
        round((sseT - sseL - sseR) * 1e6, 0).cast(LongType).as("gain_micro"))
    cand.groupBy("series").agg(
        min(struct((-col("gain_micro")).as("ng"), col("d").as("cp_d"),
          col("i").as("nl"), col("cs").as("sl"), col("nd").as("nd"),
          col("ts_").as("ts"))).as("m"))
      .select(col("series"), col("m.nd").as("n_days"),
        col("m.cp_d").as("cp_d"), col("m.nl").as("n_left"),
        round(col("m.sl").cast(DoubleType) /
          col("m.nl").cast(DoubleType), 6).as("mean_left"),
        round((col("m.ts") - col("m.sl")).cast(DoubleType) /
          (col("m.nd") - col("m.nl")).cast(DoubleType), 6).as("mean_right"),
        round((-col("m.ng")).cast(DoubleType) / 1e6, 6).as("gain"))
  }
}
