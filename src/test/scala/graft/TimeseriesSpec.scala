package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Timeseries

/** Hand-computed evidence for the time-series layer: integer-exact
  * CUSUM peaks a constructed level shift, ACF of a period-2 series is
  * large-negative at lag 1 and large-positive at lag 2 (exact
  * fractions), EWMA's power-of-two weights renormalize at the series
  * edge, and the sequence-pattern regex counts non-overlapping
  * conversions.
  */
class TimeseriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def ts(day: Int, i: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-${day + 1}%02d 00:00:${i % 60}%02d")

  /** `perDay(d) = count` expanded to (user_id, event_id, ts, event_type). */
  private def series(perDay: Seq[Int]) = {
    val rows = for {
      (cnt, day) <- perDay.zipWithIndex
      i <- 0 until cnt
    } yield (1L, (day * 1000 + i).toLong, ts(day, i), "view")
    rows.toDF("user_id", "event_id", "ts", "event_type")
  }

  test("dailySeries: dense 0-based index from the series minimum") {
    val out = Timeseries.dailySeries(series(Seq(2, 3, 1)))
      .select("idx", "n").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 2L), (1, 3L), (2, 1L)))
  }

  test("cusum: level shift peaks at the last pre-shift day, integer-exact") {
    // 10,10,10,10,20,20,20,20: N=8, T=120, r = 8n-120 = ∓40
    // cumsum: -40,-80,-120,-160,-120,-80,-40,0 -> |peak|=160 at day 3
    val out = Timeseries.cusumChangepoint(series(Seq(10, 10, 10, 10, 20, 20, 20, 20)))
      .select("cusum_scaled", "is_peak").as[(Long, Boolean)].collect()
    assert(out.map(_._1).toSeq ==
      Seq(-40L, -80L, -120L, -160L, -120L, -80L, -40L, 0L))
    assert(out.map(_._2).toSeq ==
      Seq(false, false, false, true, false, false, false, false))
  }

  test("acf: period-2 series has acf(1) = -5/6, acf(2) = +2/3 exactly") {
    // 10,20 ×3: N=6, T=90, r = 6n-90 = ∓30; den = 6·900 = 5400
    // lag1: 5 pairs, each -900 -> -4500/5400 = -0.833333...
    // lag2: 4 pairs, each +900 -> +3600/5400 = +0.666667
    val out = Timeseries.acf(series(Seq(10, 20, 10, 20, 10, 20)), maxLag = 2)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, 5L, -833333L), (2, 4L, 666667L)))
  }

  test("ljungBox: hand-computed Q on an alternating series; lags past the data drop out") {
    // 2,1,2,1: N=4, T=6, r = 4n−6 = [2,−2,2,−2], den = 16
    // ρ1 = −12/16 = −0.75, ρ2 = 8/16 = 0.5, ρ3 = −4/16 = −0.25
    // Q = 4·6·(0.5625/3 + 0.25/2 + 0.0625/1) = 24·0.375 = 9
    val out = Timeseries.ljungBox(series(Seq(2, 1, 2, 1)), maxLag = 7)
      .collect().head
    assert(out.getAs[Long]("m_lags") == 3L) // lags 4..7 have no pairs
    assert(out.getAs[Long]("n_days") == 4L)
    assert(out.getAs[Long]("dof") == 3L)
    assert(out.getAs[Double]("q_stat") == 9.0)
    // a constant series has zero autocorrelation at every lag -> Q = 0
    val flat = Timeseries.ljungBox(series(Seq(5, 5, 5, 5)), maxLag = 2)
      .collect().head
    assert(flat.getAs[Double]("q_stat") == 0.0)
  }

  test("hurstRS: alternating series scores R/S = 1 at every window; ramp reads persistent") {
    // 1,3 alternating over 8 days: every block's Z path is (-k, 0,
    // ...) with range exactly sqrt(sum r²/w) -> R/S = 1, ln = 0 at
    // both windows -> slope (hurst) = 0
    val alt = Timeseries.hurstRS(series(Seq(1, 3, 1, 3, 1, 3, 1, 3)),
      windows = Seq(2, 4)).collect()
    assert(alt.map(_.getAs[Long]("n_blocks")).toSeq.sorted == Seq(2L, 4L))
    alt.foreach { r =>
      assert(r.getAs[Double]("avg_rs") == 1.0, s"$r")
      assert(r.getAs[Double]("hurst") == 0.0, s"$r")
    }
    // a strictly rising ramp has persistent increments: R/S grows
    // faster than sqrt(w) and the slope reads > 0.5
    val ramp = Timeseries.hurstRS(series((1 to 16).toSeq),
      windows = Seq(2, 4, 8)).collect()
    val h = ramp.head.getAs[Double]("hurst")
    assert(h > 0.5, s"ramp hurst = $h")
    // w=2 blocks of consecutive integers score exactly R/S = 1
    val w2 = ramp.find(_.getAs[Long]("wsize") == 2L).get
    assert(w2.getAs[Double]("avg_rs") == 1.0)
  }

  test("dispersionTest: constant series VMR 0; hand-computed bursty case") {
    // constant 5,5,5,5: variance 0 -> VMR = D = 0
    val flat = Timeseries.dispersionTest(series(Seq(5, 5, 5, 5)))
      .collect().head
    assert(flat.getAs[Long]("n_days") == 4L)
    assert(flat.getAs[Double]("mean") == 5.0)
    assert(flat.getAs[Double]("vmr") == 0.0)
    // 1,1,1,9: T = 12, Σx² = 84, n = 4 -> num = 4·84 − 144 = 192;
    // VMR = 192/(3·12) = 16/3; D = 192/12 = 16
    val burst = Timeseries.dispersionTest(series(Seq(1, 1, 1, 9)))
      .collect().head
    assert(burst.getAs[Double]("mean") == 3.0)
    assert(burst.getAs[Double]("vmr") ==
      BigDecimal(16.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(burst.getAs[Double]("d_stat") == 16.0)
    assert(burst.getAs[Long]("dof") == 3L)
  }

  test("dispersionTest: zero-event days densify into the series (gap day counts)") {
    // 1,<gap>,5 over days 0..2: densified x = [1,0,5] -> n=3, T=6,
    // Σx²=26, num = 3·26−36 = 42; mean = 2; VMR = 42/(2·6) = 3.5;
    // D = 42/6 = 7. The zero-truncated (observed-days-only) series
    // would read n=2, VMR = 16/6 — the gap IS burstiness evidence.
    val gap = Timeseries.dispersionTest(series(Seq(1, 0, 5)))
      .collect().head
    assert(gap.getAs[Long]("n_days") == 3L)
    assert(gap.getAs[Double]("mean") == 2.0)
    assert(gap.getAs[Double]("vmr") == 3.5)
    assert(gap.getAs[Double]("d_stat") == 7.0)
    assert(gap.getAs[Long]("dof") == 2L)
  }

  test("ljungBox: a 1-day series reports n_days = 1 with zero usable lags") {
    // no lag has a pair -> terms is EMPTY; n_days must still come
    // from the daily-series total, not max() over the empty terms
    val one = Timeseries.ljungBox(series(Seq(4)), maxLag = 7)
      .collect().head
    assert(one.getAs[Long]("m_lags") == 0L)
    assert(one.getAs[Long]("n_days") == 1L)
    assert(one.getAs[Long]("dof") == 0L)
    assert(one.getAs[Double]("q_stat") == 0.0)
  }

  test("ewma: power-of-two weights, edge renormalization") {
    // window=2 -> weights (2,1). day0: 10 (only itself);
    // day1: (2·40 + 1·10)/3 = 30 exactly
    val out = Timeseries.ewma(series(Seq(10, 40)), window = 2)
      .select("ewma_micro").as[Long].collect()
    assert(out.toSeq == Seq(10000000L, 30000000L))
  }

  test("seqPattern: non-overlapping v..p conversions + funnel flag") {
    val rows = Seq(
      // user 1: s v x p v p -> 2 conversions, funnel present
      (1L, 1L, ts(0, 1), "signup"), (1L, 2L, ts(0, 2), "view"),
      (1L, 3L, ts(0, 3), "x_other"), (1L, 4L, ts(0, 4), "purchase"),
      (1L, 5L, ts(0, 5), "view"), (1L, 6L, ts(0, 6), "purchase"),
      // user 2: p v -> no conversion, no funnel
      (2L, 7L, ts(0, 1), "purchase"), (2L, 8L, ts(0, 2), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Timeseries.seqPattern(rows)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 6L, 2L, true), (2L, 2L, 0L, false)))
  }

  test("seasonalAnomalies: weekday-relative spike flags; flat weekday scores 0") {
    // 4 weeks: every day 10 events, except one Wednesday at 30 —
    // unconditionally z-scoring all days would dilute the spike across
    // weekdays; seasonal scoring isolates it within the 4 Wednesdays
    val perDay = Seq.tabulate(28)(d => if (d == 16) 30 else 10)
    // with 4 samples per weekday a single outlier's population z is
    // bounded by √3 ≈ 1.732, so gate at 1.5 for the test
    val out = Timeseries.seasonalAnomalies(series(perDay),
        zThreshMicro = 1500000L)
      .select("d", "n", "z_micro", "is_anomaly")
      .as[(java.sql.Date, Long, Long, Boolean)].collect()
    assert(out.length == 28)
    val flagged = out.filter(_._4)
    assert(flagged.map(_._2).toSeq == Seq(30L),
      s"only the spiked day may flag: ${flagged.toSeq}")
    // spiked weekday: mean 15, var (3*25+225)/4 - ... num = 4*30-60=60,
    // den = 4*1200 - 3600 = 1200 -> z = 60/sqrt(1200) = 1.7320508...
    assert(flagged.head._3 == 1732051L, s"z: ${flagged.head._3}")
    // days on weekdays with constant counts score exactly 0
    assert(out.count(_._3 == 0L) == 24, "constant weekdays must score 0")
  }

  test("theilSen: one outage day cannot move the median slope (least squares would)") {
    // 10,20,30,1000,50 on days 0..4: 10 pairwise slopes sort to
    // [-950,10×6,330,490,970] → median slope 10/day exactly; the
    // residual median is 10·10⁶ despite the 970·10⁶ outlier residual
    val out = Timeseries.theilSen(series(Seq(10, 20, 30, 1000, 50)))
      .select("n_days", "slope_micro", "intercept_micro")
      .as[(Int, Long, Long)].head()
    assert(out == ((5, 10000000L, 10000000L)), s"got $out")
    // single-day series: zero slope, intercept = the one observation
    val one = Timeseries.theilSen(series(Seq(42)))
      .select("slope_micro", "intercept_micro").as[(Long, Long)].head()
    assert(one == ((0L, 42000000L)), s"degenerate: $one")
  }

  test("madOutliers: the spike cannot mask itself; MAD=0 convention flags only off-median days") {
    // varied series: median 10, MAD 1 → day 100 scores 0.6745·90 ≈ 60.7,
    // day 12 scores 1.349 (below 3.5)
    val out = Timeseries.madOutliers(series(Seq(8, 10, 12, 10, 9, 11, 10, 100)))
      .select("x", "rz_micro", "is_outlier")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(100L)._3 && out(100L)._2 == 60705000L, s"spike: ${out(100L)}")
    assert(!out(12L)._3 && out(12L)._2 == 1349000L, s"mild day: ${out(12L)}")
    // >50% identical days → MAD 0: median days score 0, the spike ±1e9
    val z = Timeseries.madOutliers(series(Seq(10, 10, 10, 10, 10, 100)))
      .select("x", "rz_micro", "is_outlier")
      .as[(Long, Long, Boolean)].collect()
    assert(z.filter(_._1 == 10L).forall(r => r._2 == 0L && !r._3))
    assert(z.find(_._1 == 100L).get._2 == 1000000000L)
  }

  test("holtForecast: hand-computed level/trend fold; constant series has zero trend") {
    // x = [10, 20, 30], α=300‰, β=100‰:
    // l₁=10000 b₁=0; l₂=⌊(6e6+7e6)/1000⌋=13000, b₂=⌊3e5/1000⌋=300;
    // l₃=⌊(9e6+700·13300)/1000⌋=18310, b₃=⌊(531000+270000)/1000⌋=801
    val out = Timeseries.holtForecast(series(Seq(10, 20, 30)))
      .select("n_days", "level_milli", "trend_milli", "f1_milli", "f3_milli")
      .as[(Int, Long, Long, Long, Long)].head()
    assert(out == ((3, 18310L, 801L, 19111L, 20713L)), s"got $out")
    // constant series: level pinned at x·1000, trend exactly 0
    val const = Timeseries.holtForecast(series(Seq(7, 7, 7, 7)))
      .select("level_milli", "trend_milli", "f2_milli")
      .as[(Long, Long, Long)].head()
    assert(const == ((7000L, 0L, 7000L)), s"constant: $const")
    // growing series forecasts above the last level
    val grow = Timeseries.holtForecast(series(Seq(5, 10, 15, 20, 25)))
      .select("level_milli", "trend_milli").as[(Long, Long)].head()
    assert(grow._2 > 0, s"trend must be positive on growth: $grow")
  }

  test("holtWinters: hand-computed seasonal fold; short series excluded") {
    // x = [10, 14, 12, 18], m=2, α=300‰ β=100‰ γ=200‰:
    // init l₀=12000, s=[−2000, 2000], b=0
    // t=3 (x=12, s₋ₘ=−2000): l=⌊(300·14000+700·12000)/1000⌋=12600,
    //   b=⌊100·600/1000⌋=60, s₃=⌊(200·(−600)+800·(−2000))/1000⌋=−1720
    // t=4 (x=18, s₋ₘ=2000): l=⌊(300·16000+700·12660)/1000⌋=13662,
    //   b=⌊(100·1062+900·60)/1000⌋=160,
    //   s₄=⌊(200·4338+800·2000)/1000⌋=2467 → sl=[−1720, 2467]
    // f1 = 13662+160−1720 = 12102; f2 = 13662+320+2467 = 16449
    val out = Timeseries.holtWintersForecast(series(Seq(10, 14, 12, 18)),
        period = 2, horizon = 2)
      .select("n_days", "level_milli", "trend_milli", "f1_milli", "f2_milli")
      .as[(Int, Long, Long, Long, Long)].head()
    assert(out == ((4, 13662L, 160L, 12102L, 16449L)), s"got $out")
    // a perfectly periodic series: level flat, trend 0, forecasts
    // reproduce the alternation exactly
    val alt = Timeseries.holtWintersForecast(series(Seq(4, 8, 4, 8, 4, 8)),
        period = 2, horizon = 2)
      .select("level_milli", "trend_milli", "f1_milli", "f2_milli")
      .as[(Long, Long, Long, Long)].head()
    assert(alt == ((6000L, 0L, 4000L, 8000L)), s"periodic: $alt")
    // series no longer than one period carry no seasonal signal
    assert(Timeseries.holtWintersForecast(series(Seq(5, 6)),
      period = 2, horizon = 2).count() == 0)
  }

  test("holtWinters: calendar gaps densify to x=0 — slot alignment survives") {
    // day 2 has ZERO events (a calendar gap): densification must fold
    // it as x=0 so the 2-slot rotation stays aligned for days 3..5 —
    // without it the fold would see 5 rows and every later slot
    // assignment would be shifted by one.
    // Hand fold of [4,8,0,8,4,8], m=2, α=300 β=100 γ=200:
    // l0=6000 s=[−2000,2000] b=0
    // t3 x=0:  l=4800  b=−120 s→[2000,−2560]
    // t4 x=8:  l=5076  b=−81  s→[−2560,2184]
    // t5 x=4:  l=5464  b=−35  s→[2184,−2341]
    // t6 x=8:  l=5545  b=−24  s→[−2341,2238]
    val out = Timeseries.holtWintersForecast(series(Seq(4, 8, 0, 8, 4, 8)),
        period = 2, horizon = 2)
      .select("n_days", "level_milli", "trend_milli", "f1_milli", "f2_milli")
      .as[(Int, Long, Long, Long, Long)].head()
    assert(out._1 == 6, s"densified length counts the gap day: $out")
    assert(out == ((6, 5545L, -24L, 3180L, 7735L)), s"got $out")
  }

  test("forecastBacktest: periodic test week scores exactly; naive ties give mase 1") {
    // [4,8,4,8,4,8] td=2 m=2: train [4,8,4,8] → l=6000 b=0
    // sl=[−2000,2000]; forecasts [4000,8000] = test exactly AND the
    // naive repeat is also exact → both MAEs 0, mase 0 by the
    // zero-denominator convention
    val exact = Timeseries.forecastBacktest(series(Seq(4, 8, 4, 8, 4, 8)),
        period = 2, testDays = 2)
      .select("n_days", "mae_model_milli", "mae_naive_milli", "mase")
      .as[(Int, Long, Long, Double)].head()
    assert(exact == ((6, 0L, 0L, 0.0)), s"$exact")
    // test [5,8]: model errs |4000−5000|=1000 on day 1, 0 on day 2;
    // the naive repeat errs identically → mase exactly 1
    val tied = Timeseries.forecastBacktest(series(Seq(4, 8, 4, 8, 5, 8)),
        period = 2, testDays = 2)
      .select("mae_model_milli", "mae_naive_milli", "mase")
      .as[(Long, Long, Double)].head()
    assert(tied == ((500L, 500L, 1.0)), s"$tied")
    // too-short series are excluded (train must exceed one period)
    assert(Timeseries.forecastBacktest(series(Seq(4, 8, 4, 8)),
      period = 2, testDays = 2).count() == 0)
  }

  test("periodogram: a period-2 alternation peaks at 2 with full power; constant series scores 0") {
    // counts [3,1,3,1,3,1]: r = [6,−6,…], Sc(P=2) = 36, den = 216,
    // nd = 6 ⇒ power = 36²/(216·6) = 1 exactly
    val out = Timeseries.periodogram(series(Seq(3, 1, 3, 1, 3, 1)),
        minPeriod = 2, maxPeriod = 5)
      .select("period", "power_micro", "is_peak")
      .as[(Int, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(2) == ((2, 1000000L, true)), s"full power at 2: ${out(2)}")
    assert((3 to 5).forall(p => out(p)._2 < 1000000L && !out(p)._3),
      s"other periods below peak: $out")
    // constant series: every residual 0 ⇒ den 0 ⇒ all powers 0
    val const = Timeseries.periodogram(series(Seq(4, 4, 4, 4)),
        minPeriod = 2, maxPeriod = 3)
      .select("power_micro").as[Long].collect()
    assert(const.forall(_ == 0L), s"constant: ${const.toSeq}")
    // factor table is exact at the cardinal angles
    val f = Timeseries.periodogramFactors(2, 4).toMap2
    assert(f((2, 0)) == ((1000000L, 0L)) && f((2, 1)) == ((-1000000L, 0L)),
      s"cardinal factors: $f")
  }

  private implicit class FactorOps(s: Seq[(Int, Int, Long, Long)]) {
    def toMap2: Map[(Int, Int), (Long, Long)] =
      s.map { case (p, m, c, x) => (p, m) -> (c, x) }.toMap
  }

  test("changePoint: SSE-optimal split on a planted level shift") {
    // 1,1,1,9,9,9: total SSE 96, split after day 3 explains all of it
    val r = Timeseries.changePoint(series(Seq(1, 1, 1, 9, 9, 9)))
      .collect().head
    assert(r.getAs[Long]("n_days") == 6)
    assert(r.getAs[java.sql.Date]("cp_d").toString == "2026-01-03")
    assert(r.getAs[Long]("n_left") == 3)
    assert(r.getAs[Double]("mean_left") == 1.0)
    assert(r.getAs[Double]("mean_right") == 9.0)
    assert(r.getAs[Double]("gain") == 96.0)
    // constant series: every split has gain 0; ties resolve to the
    // EARLIEST day (the struct-min contract)
    val flat = Timeseries.changePoint(series(Seq(5, 5, 5, 5))).collect().head
    assert(flat.getAs[Double]("gain") == 0.0)
    assert(flat.getAs[java.sql.Date]("cp_d").toString == "2026-01-01")
    // a single-day series has no split to offer
    assert(Timeseries.changePoint(series(Seq(7))).count() == 0)
  }

  test("durbinWatson: alternation scores above 2, clumping below, constant guards to 0") {
    // 1,9,1,9: r = {-16,16,-16,16}, num = 3*32^2, den = 4*16^2 -> DW 3
    val alt = Timeseries.durbinWatson(series(Seq(1, 9, 1, 9))).collect().head
    assert(alt.getAs[Long]("n_days") == 4)
    assert(alt.getAs[Double]("dw") == 3.0)
    // 1,1,9,9: one nonzero jump -> DW 1 (positive autocorrelation)
    val clump = Timeseries.durbinWatson(series(Seq(1, 1, 9, 9)))
      .collect().head
    assert(clump.getAs[Double]("dw") == 1.0)
    // constant series: zero variance -> 0 by contract
    assert(Timeseries.durbinWatson(series(Seq(5, 5, 5))).collect().head
      .getAs[Double]("dw") == 0.0)
  }

  test("runsTest: clumped signs score negative, alternating positive, median days drop") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 1,1,1,9,9,9: two runs of three -> z = (2-4)/sqrt(1.2)
    val clump = Timeseries.runsTest(series(Seq(1, 1, 1, 9, 9, 9)))
      .collect().head
    assert(clump.getAs[Long]("n1") == 3 && clump.getAs[Long]("n2") == 3)
    assert(clump.getAs[Long]("runs") == 2)
    assert(clump.getAs[Double]("z") == r6((2.0 - 4.0) / math.sqrt(1.2)))
    // 1,9,1,9: four runs -> z = 1/sqrt(2/3) > 0
    val alt = Timeseries.runsTest(series(Seq(1, 9, 1, 9))).collect().head
    assert(alt.getAs[Long]("runs") == 4)
    assert(alt.getAs[Double]("z") ==
      r6(1.0 / math.sqrt(2.0 * 2.0 * 2.0 * (8.0 - 4.0) / (16.0 * 3.0))))
    // a day AT the median drops; the 2-day remainder has sigma 0 -> z 0
    val thin = Timeseries.runsTest(series(Seq(1, 2, 9))).collect().head
    assert(thin.getAs[Long]("n1") == 1 && thin.getAs[Long]("n2") == 1)
    assert(thin.getAs[Double]("z") == 0.0)
  }
}
