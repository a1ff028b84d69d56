package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Evaluation, Timeseries}

/** Hand-computed textbook examples + degenerate shapes for the round-14
  * statistics: Mann–Whitney, Benjamini–Hochberg, Mantel–Haenszel,
  * Jensen–Shannon, Kaplan–Meier, Mann–Kendall. */
class EvalStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("mannWhitney: hand-computed U and z with ties; degenerate arms") {
    // arm a: {1,2,3}, arm b: {2,3,4} -> U_b = 7 (two half-ties), u2 = 14
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 2L), (1, 3L), (1, 4L))
      .toDF("arm", "v_micro").withColumn("group", lit("g"))
    val r = Evaluation.mannWhitney(df).collect().head
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Long]("u2") == 14L)
    // z replayed with the operator's exact IEEE shape
    val varU = 3.0 * 3.0 / 12.0 * ((6.0 + 1.0) - 12.0 / (6.0 * 5.0))
    val expZ = BigDecimal((14.0 - 9.0) / (2.0 * math.sqrt(varU)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == expZ)
    // empty arm -> z = 0 by convention
    val oneArm = Seq((1, 5L), (1, 6L)).toDF("arm", "v_micro")
      .withColumn("group", lit("g"))
    assert(Evaluation.mannWhitney(oneArm).collect().head
      .getAs[Double]("z") == 0.0)
    // every value tied -> zero variance -> z = 0
    val tied = Seq((0, 7L), (0, 7L), (1, 7L), (1, 7L))
      .toDF("arm", "v_micro").withColumn("group", lit("g"))
    val tr = Evaluation.mannWhitney(tied).collect().head
    assert(tr.getAs[Double]("z") == 0.0)
  }

  test("bhAdjust: step-up running min, reject boundary, deterministic tie order") {
    // p = {.001, .012, .04, .9}, m = 4: raw = {.004, .024, .0533.., .9}
    val tests = Seq(("t1", 1000L), ("t2", 12000L), ("t3", 40000L),
      ("t4", 900000L)).toDF("test", "p_micro").withColumn("group", lit("f"))
    val out = Evaluation.bhAdjust(tests).collect()
      .map(r => r.getAs[String]("test") ->
        ((r.getAs[Long]("rnk"), r.getAs[Double]("p_adj"),
          r.getAs[Boolean]("reject")))).toMap
    assert(out("t1") == ((1L, 0.004, true)))
    assert(out("t2") == ((2L, 0.024, true)))
    assert(out("t3") == ((3L, 0.053333, false))) // > q: fails the gate
    assert(out("t4") == ((4L, 0.9, false)))
    // running-min: a LATER small p caps an earlier larger raw value
    val caps = Seq(("a", 100000L), ("b", 100000L)).toDF("test", "p_micro")
      .withColumn("group", lit("f"))
    val c = Evaluation.bhAdjust(caps).collect()
      .map(r => r.getAs[String]("test") -> r.getAs[Double]("p_adj")).toMap
    // p=(0.1, 0.1): raw = (0.2, 0.1); min-from-bottom caps rank1 to 0.1
    assert(c("a") == 0.1 && c("b") == 0.1)
  }

  test("mantelHaenszel: textbook two-strata OR and CMH chi-square; thin strata excluded") {
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
        Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))
    // s1: (4,1,2,3), s2: (2,3,1,4) -> OR_MH = 2.0/0.5 = 4, chi2 = 0.8
    val rows = (stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 2, 3, 1, 4))
      .toDF("stratum", "arm", "y").withColumn("group", lit("g"))
    val r = Evaluation.mantelHaenszel(rows).collect().head
    assert(r.getAs[Long]("n_strata") == 2 && r.getAs[Long]("sum_a") == 6)
    assert(r.getAs[Double]("or_mh") == 4.0)
    assert(r.getAs[Double]("chi2") == 0.8)
    // a single-row stratum carries no variance and drops wholesale
    val withThin = (stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 2, 3, 1, 4)
      ++ Seq(("thin", 1, 1))).toDF("stratum", "arm", "y")
      .withColumn("group", lit("g"))
    assert(Evaluation.mantelHaenszel(withThin).collect().head
      .getAs[Long]("n_strata") == 2)
  }

  test("jsDivergence: identical sides -> 0; disjoint vocab -> ln 2 (1 bit)") {
    val same = Seq((0, "x"), (0, "y"), (1, "x"), (1, "y"))
      .toDF("side", "tok").withColumn("group", lit("g"))
    val s = Evaluation.jsDivergence(same).collect().head
    assert(s.getAs[Double]("js_nats") == 0.0 && s.getAs[Double]("js_bits") == 0.0)
    val disjoint = Seq((0, "x"), (1, "y")).toDF("side", "tok")
      .withColumn("group", lit("g"))
    val d = Evaluation.jsDivergence(disjoint).collect().head
    assert(d.getAs[Double]("js_nats") == 0.693147) // ln 2 at 6dp
    assert(d.getAs[Double]("js_bits") == 1.0)
    assert(d.getAs[Long]("vocab") == 2)
  }

  test("kaplanMeier: textbook curve with censoring; whole-risk-set death pins S=0") {
    // subjects: event@1, censor@2, event@3, event@4, censor@5
    val subj = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 1), (5L, 0))
      .toDF("t", "event").withColumn("group", lit("g"))
    val rows = Evaluation.kaplanMeier(subj).collect()
      .map(r => r.getAs[Long]("t") ->
        ((r.getAs[Long]("n_risk"), r.getAs[Double]("surv")))).toMap
    assert(rows.keySet == Set(1L, 3L, 4L)) // event times only
    assert(rows(1L)._1 == 5 && math.abs(rows(1L)._2 - 0.8) < 2e-6)
    assert(rows(3L)._1 == 3 && math.abs(rows(3L)._2 - 0.8 * 2.0 / 3.0) < 2e-6)
    assert(rows(4L)._1 == 2 && math.abs(rows(4L)._2 - 0.8 / 3.0) < 2e-6)
    // the whole risk set dying at t pins S to 0 from there on
    val wipe = Seq((1L, 1), (2L, 1), (2L, 1)).toDF("t", "event")
      .withColumn("group", lit("g"))
    val w = Evaluation.kaplanMeier(wipe).collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Double]("surv")).toMap
    assert(math.abs(w(1L) - 2.0 / 3.0) < 2e-6 && w(2L) == 0.0)
  }

  test("mannKendall: monotone series detects trend; constant series reports none") {
    // day i carries i events -> strictly increasing counts, S = C(8,2)
    val base = java.sql.Timestamp.valueOf("2026-01-01 12:00:00").getTime
    val up = (1 to 8).flatMap(i => Seq.fill(i)(
      ("up", new java.sql.Timestamp(base + i * 86400000L))))
      .toDF("event_type", "ts")
    val r = Timeseries.mannKendall(up).collect().head
    assert(r.getAs[Long]("n_days") == 8 && r.getAs[Long]("s") == 28)
    val varS = (8.0 * 7.0 * 21.0) / 18.0
    val expZ = BigDecimal(27.0 / math.sqrt(varS))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == expZ)
    assert(r.getAs[String]("trend") == "increasing")
    // constant series: every day ties -> variance 0 -> z = 0, none
    val flat = (1 to 6).flatMap(i => Seq.fill(2)(
      ("flat", new java.sql.Timestamp(base + i * 86400000L))))
      .toDF("event_type", "ts")
    val f = Timeseries.mannKendall(flat).collect().head
    assert(f.getAs[Double]("z") == 0.0 && f.getAs[String]("trend") == "none")
  }

  test("cochranQ: hand-computed 3-rater example; incomplete items excluded") {
    // items i1..i4 × raters r1..r3: L = (3,1,1,1), G = (3,2,1); N = 6
    // Q = (k-1)(k·ΣG² - N²)/(kN - ΣL²) = 2·(42-36)/(18-12) = 2.0
    val y = Map(("i1","r1")->1,("i1","r2")->1,("i1","r3")->1,
      ("i2","r1")->1,("i2","r2")->0,("i2","r3")->0,
      ("i3","r1")->0,("i3","r2")->1,("i3","r3")->0,
      ("i4","r1")->1,("i4","r2")->0,("i4","r3")->0)
    val rows = y.toSeq.map { case ((i, r), v) => (i, r, v) }
      .toDF("item", "rater", "y").withColumn("group", lit("g"))
    val out = Evaluation.cochranQ(rows).collect().head
    assert(out.getAs[Long]("k") == 3 && out.getAs[Long]("n_items") == 4)
    assert(out.getAs[Double]("q") == 2.0)
    // an item missing a rater drops; the complete set is unchanged
    val withPartial = rows.unionAll(Seq(("i5", "r1", 1)).toDF("item", "rater", "y")
      .withColumn("group", lit("g")).select("item", "rater", "y", "group"))
    val out2 = Evaluation.cochranQ(withPartial).collect().head
    assert(out2.getAs[Long]("n_items") == 4 && out2.getAs[Double]("q") == 2.0)
  }

  test("prAuc: perfect ranking -> 1; random-tie single score -> base rate") {
    // scores separate perfectly: AP = 1
    val perfect = Seq((90L, 1), (80L, 1), (20L, 0), (10L, 0))
      .toDF("score_micro", "y").withColumn("group", lit("g"))
    assert(Evaluation.prAuc(perfect).collect().head
      .getAs[Double]("pr_auc") == 1.0)
    // one tied score bucket: AP = precision at the single cut = 1/3
    val tied = Seq((50L, 1), (50L, 0), (50L, 0))
      .toDF("score_micro", "y").withColumn("group", lit("g"))
    assert(Evaluation.prAuc(tied).collect().head
      .getAs[Double]("pr_auc") == 0.333333)
    // no positives -> 0 by convention
    val nopos = Seq((50L, 0)).toDF("score_micro", "y")
      .withColumn("group", lit("g"))
    assert(Evaluation.prAuc(nopos).collect().head
      .getAs[Double]("pr_auc") == 0.0)
  }

  test("logRank: identical arms -> chi2 0; disjoint death times separate") {
    // both arms die at the same times -> O1 = E1 exactly
    val same = Seq((0, 1L, 1), (1, 1L, 1), (0, 2L, 1), (1, 2L, 1))
      .toDF("arm", "t", "event").withColumn("group", lit("g"))
    val s = Evaluation.logRank(same).collect().head
    assert(s.getAs[Long]("o1") == 2 &&
      math.abs(s.getAs[Double]("e1") - 2.0) < 1e-6)
    assert(s.getAs[Double]("chi2") == 0.0)
    // arm1 dies strictly earlier: textbook 2-subject example
    // t=1: n=2, n1=1, d=1 (arm1): E1 = 0.5, V = 0.25
    // t=2: n=1 (arm0 only), d=1: E1 = 0, V = 0 (n-1 = 0)
    val early = Seq((1, 1L, 1), (0, 2L, 1))
      .toDF("arm", "t", "event").withColumn("group", lit("g"))
    val e = Evaluation.logRank(early).collect().head
    assert(e.getAs[Long]("o1") == 1 &&
      math.abs(e.getAs[Double]("e1") - 0.5) < 1e-6)
    assert(math.abs(e.getAs[Double]("chi2") - 1.0) < 1e-5) // 0.25/0.25
  }

  test("effectSize: known two-arm example; Hedges' g shrinks d; degenerate arms") {
    // arm a {1,2,3}, arm b {3,4,5}: means 2,4; var 1,1; sp = 1; d = 2
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 3L), (1, 4L), (1, 5L))
      .toDF("arm", "y").withColumn("group", lit("g"))
    val r = Evaluation.effectSize(df).collect().head
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("d") == 2.0)
    val expG = BigDecimal((1.0 - 3.0 / (4.0 * 6.0 - 9.0)) * 2.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("g") == expG)
    // single-subject arm -> d = g = 0
    val thin = Seq((0, 1L), (1, 3L), (1, 4L)).toDF("arm", "y")
      .withColumn("group", lit("g"))
    val t = Evaluation.effectSize(thin).collect().head
    assert(t.getAs[Double]("d") == 0.0 && t.getAs[Double]("g") == 0.0)
  }

  test("pageHinkley: running-min resets evidence after a dip; flat series flags nothing") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 12:00:00").getTime
    def ev(series: String, dayCounts: Seq[Int]) =
      dayCounts.zipWithIndex.flatMap { case (c, i) => Seq.fill(c)(
        (series, new java.sql.Timestamp(base + (i + 1) * 86400000L))) }
    // dip then surge: the PH peak lands at the end of the surge, and
    // the statistic measures rise from the post-dip minimum
    val df = ev("s", Seq(5, 1, 1, 9, 9)).toDF("event_type", "ts")
    val rows = graft.ext.Timeseries.pageHinkley(df).collect()
      .map(r => (r.getAs[java.sql.Date]("d").toString,
        r.getAs[Long]("ph_scaled"), r.getAs[Boolean]("is_peak")))
      .sortBy(_._1)
    assert(rows.last._3, s"peak must be the final surge day: ${rows.toSeq}")
    assert(rows.count(_._3) == 1)
    // mean-cleared: day counts 5,1,1,9,9 (mean 5): r = 5(x-5) scaled
    // m: 0,-20,-40,-20,0; runmin: 0,-20,-40,-40,-40 -> ph: 0,0,0,20,40
    assert(rows.map(_._2).toSeq == Seq(0L, 0L, 0L, 20L, 40L))
    val flat = ev("f", Seq(3, 3, 3)).toDF("event_type", "ts")
    assert(graft.ext.Timeseries.pageHinkley(flat).collect()
      .forall(!_.getAs[Boolean]("is_peak")))
  }

  test("gwetAC1: stays high on a skewed panel where kappa collapses") {
    // 90 (en,en) + 5 (en,es) + 5 (es,en): po=0.9 but en-dominated
    val rows = (Seq.fill(90)(("en", "en")) ++ Seq.fill(5)(("en", "es")) ++
      Seq.fill(5)(("es", "en"))).toDF("label_a", "label_b")
      .withColumn("group", lit("g"))
    val ac1 = Evaluation.gwetAC1(rows).collect().head
    val k = Evaluation.cohenKappa(rows).collect().head
    assert(ac1.getAs[Double]("po") == 0.9)
    // kappa's paradox: near-zero despite 90% agreement; AC1 stays high
    assert(k.getAs[Double]("kappa") < 0.05, s"$k")
    assert(ac1.getAs[Double]("ac1") > 0.85, s"$ac1")
    // hand check: m_en = 190, m_es = 10, N = 100:
    // pe = (190·10 + 10·190)/(4·10⁴·1) = 0.095; ac1 = (0.9-.095)/.905
    assert(ac1.getAs[Double]("pe_gamma") == 0.095)
    assert(ac1.getAs[Double]("ac1") ==
      BigDecimal((0.9 - 0.095) / (1.0 - 0.095))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // single-category panel -> 0 by convention
    val one = Seq(("x", "x"), ("x", "x")).toDF("label_a", "label_b")
      .withColumn("group", lit("g"))
    assert(Evaluation.gwetAC1(one).collect().head.getAs[Double]("ac1") == 0.0)
  }

  test("rboOverlap: identical rankings -> 1; disjoint -> 0; order sensitivity at the top") {
    def rk(items: Seq[String]) = items.zipWithIndex
      .map { case (it, i) => (it, (100 - i).toLong) }
      .toDF("item", "score_micro").withColumn("group", lit("g"))
    val a = rk(Seq("a", "b", "c", "d"))
    val same = Evaluation.rboOverlap(a, rk(Seq("a", "b", "c", "d")), k = 4)
      .collect().head
    // identical length-4 lists at k=4: X_d = d, terms sum to Σp^{d-1},
    // (1-p)·Σ = 1 - p^4
    // replay the operator's exact IEEE term shape ((p^{d-1}·X_d)/d)·1e9
    val exp = BigDecimal(
      (1 to 4).map { d =>
        BigDecimal(math.pow(0.9, d - 1) * d.toDouble / d.toDouble * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum / 1e9 * (1.0 - 0.9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(same.getAs[Double]("rbo") == exp)
    assert(same.getAs[Long]("overlap_k") == 4)
    val disj = Evaluation.rboOverlap(a, rk(Seq("w", "x", "y", "z")), k = 4)
      .collect().head
    assert(disj.getAs[Double]("rbo") == 0.0 && disj.getAs[Long]("overlap_k") == 0)
    // agreement at the TOP outweighs the same agreement at the bottom
    val topAgree = Evaluation.rboOverlap(a, rk(Seq("a", "x", "y", "z")), k = 4)
      .collect().head.getAs[Double]("rbo")
    val botAgree = Evaluation.rboOverlap(a, rk(Seq("w", "x", "y", "d")), k = 4)
      .collect().head.getAs[Double]("rbo")
    assert(topAgree > botAgree)
  }

  test("robustLocation: a whale moves the mean but not the trimmed/winsorized pair") {
    // 18 values of 10, one 9, one whale 10000; N = 20, lo = 1
    val vals = Seq.fill(18)(10L) ++ Seq(9L, 10000L)
    val df = vals.toDF("v").withColumn("group", lit("g"))
    val r = Evaluation.robustLocation(df).collect().head
    assert(r.getAs[Long]("n") == 20 && r.getAs[Long]("trim_n") == 1)
    assert(r.getAs[Double]("trimmed_mean") == 10.0) // whale and 9 cut
    // winsorized: clamp 9 -> 10 and 10000 -> 10: all 10s
    assert(r.getAs[Double]("winsor_mean") == 10.0)
    // a 50%-per-side trim on two rows swallows everything -> 0
    val tiny = Seq(5L, 7L).toDF("v").withColumn("group", lit("g"))
    val t = Evaluation.robustLocation(tiny, trimMicro = 500000L)
      .collect().head
    assert(t.getAs[Long]("trim_n") == 1 &&
      t.getAs[Double]("trimmed_mean") == 0.0)
  }

  test("assortativity: star graph is strongly disassortative; ring is degree-constant") {
    // star: hub 0 <-> leaves 1..5 (symmetrized): r = -1
    val star = (1 to 5).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
      .toDF("src", "dst")
    val s = graft.operators.Graph.assortativity(star).collect().head
    assert(s.getAs[Double]("r") == -1.0)
    // ring: every degree 2 -> zero variance -> r = 0 by convention
    val n = 6
    val ring = (0 until n).flatMap(i => Seq(
      (i.toLong, ((i + 1) % n).toLong), (((i + 1) % n).toLong, i.toLong)))
      .toDF("src", "dst")
    assert(graft.operators.Graph.assortativity(ring).collect().head
      .getAs[Double]("r") == 0.0)
  }

  test("hillTail: exact Pareto sample recovers its index; light tail reads high alpha") {
    // x_(i) = ceil(1e6 / i^(1/a)) for a = 2: the Hill estimate over
    // the top k of this deterministic Pareto grid lands near 2
    val n = 2000; val a = 2.0
    val vals = (1 to n).map(i =>
      math.ceil(1e6 / math.pow(i.toDouble, 1.0 / a)).toLong)
    val df = vals.toDF("v").withColumn("group", lit("g"))
    val r = Evaluation.hillTail(df, k = 100).collect().head
    assert(r.getAs[Long]("k_used") == 100)
    val alpha = r.getAs[Double]("alpha")
    assert(alpha > 1.6 && alpha < 2.4, s"Pareto(2) tail read alpha=$alpha")
    // a uniform block (no tail) reads a much larger alpha
    val flat = (1 to 300).map(i => 1000L + i).toDF("v")
      .withColumn("group", lit("g"))
    val fa = Evaluation.hillTail(flat, k = 100).collect().head
      .getAs[Double]("alpha")
    assert(fa > 10.0, s"near-uniform values must read a light tail: $fa")
    // fewer than k+1 positive values -> x_ref null, alpha 0
    val thin = Seq(5L, 6L).toDF("v").withColumn("group", lit("g"))
    val t = Evaluation.hillTail(thin, k = 100).collect().head
    assert(t.getAs[Double]("alpha") == 0.0)
  }

  test("seasonalStrength: pure weekday profile -> 1; constant series -> 0") {
    val base = java.sql.Timestamp.valueOf("2026-01-05 12:00:00") // a Monday
    def series(name: String, counts: Int => Int, days: Int) =
      (0 until days).flatMap(i => Seq.fill(counts(i))(
        (name, new java.sql.Timestamp(base.getTime + i * 86400000L))))
    // counts depend ONLY on weekday -> residual 0 -> strength 1
    val weekly = series("w", i => 2 + (i % 7), 28).toDF("event_type", "ts")
    val w = graft.ext.Timeseries.seasonalStrength(weekly).collect().head
    assert(w.getAs[Long]("n_days") == 28)
    assert(w.getAs[Double]("strength") == 1.0)
    // constant daily counts: SST = 0 -> 0 by convention
    val flat = series("f", _ => 3, 21).toDF("event_type", "ts")
    assert(graft.ext.Timeseries.seasonalStrength(flat).collect().head
      .getAs[Double]("strength") == 0.0)
    // weekday profile + noise on one day: strength strictly inside (0,1)
    val noisy = series("n", i => 2 + (i % 7) + (if (i == 10) 9 else 0), 28)
      .toDF("event_type", "ts")
    val s = graft.ext.Timeseries.seasonalStrength(noisy).collect().head
      .getAs[Double]("strength")
    assert(s > 0.0 && s < 1.0, s"noisy weekly strength: $s")
  }

  test("brierDecomposition: perfect calibration has zero reliability; constant forecaster zero resolution") {
    // forecasts EQUAL to in-bin outcome rates: REL = 0 exactly;
    // RES = (10·0.3² + 10·0.3²)/20 = 0.09
    val perfect = (Seq.fill(8)((800000L, 1L)) ++ Seq.fill(2)((800000L, 0L)) ++
      Seq.fill(2)((200000L, 1L)) ++ Seq.fill(8)((200000L, 0L)))
      .toDF("p_micro", "y")
    val p = Evaluation.brierDecomposition(perfect).collect().head
    assert(p.getAs[Long]("n") == 20 && p.getAs[Double]("o_bar") == 0.5)
    assert(p.getAs[Double]("reliability") == 0.0, s"$p")
    assert(p.getAs[Double]("resolution") == 0.09, s"$p")
    assert(p.getAs[Double]("uncertainty") == 0.25)
    // a constant forecaster at the base rate: RES = 0, REL = 0
    val const = (Seq.fill(5)((500000L, 1L)) ++ Seq.fill(5)((500000L, 0L)))
      .toDF("p_micro", "y")
    val c = Evaluation.brierDecomposition(const).collect().head
    assert(c.getAs[Double]("resolution") == 0.0)
    assert(c.getAs[Double]("reliability") == 0.0)
    // the same streamed state finishes into calibration AND this
    val snap = Evaluation.calibrationState(perfect, bins = 10)
    assert(Evaluation.brierDecompositionFinish(snap).collect().toSeq ==
      Evaluation.brierDecomposition(perfect).collect().toSeq)
  }

  test("boxplotStats: hand-computed five numbers; whale crosses the Tukey fence") {
    val df = ((1L to 8L).map(("even", _)) ++
      Seq(("odd", 1L), ("odd", 2L), ("odd", 3L), ("odd", 4L), ("odd", 100L)))
      .toDF("group", "v")
    val out = graft.ext.Profiler.boxplotStats(df).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val e = out("even") // 1..8: q1=2, med=4.5, q3=6, no outliers
    assert(e.getAs[Long]("n") == 8 && e.getAs[Long]("v_min") == 1 &&
      e.getAs[Long]("v_max") == 8)
    assert(e.getAs[Long]("q1") == 2 && e.getAs[Long]("q3") == 6)
    assert(e.getAs[Double]("median") == 4.5)
    assert(e.getAs[Long]("iqr") == 4)
    assert(e.getAs[Long]("n_low_outliers") == 0 &&
      e.getAs[Long]("n_high_outliers") == 0)
    // {1,2,3,4,100}: q1=2, med=3, q3=4, iqr=2 -> high fence 7; the
    // whale is the one outlier
    val o = out("odd")
    assert(o.getAs[Long]("q1") == 2 && o.getAs[Double]("median") == 3.0 &&
      o.getAs[Long]("q3") == 4)
    assert(o.getAs[Long]("n_high_outliers") == 1 &&
      o.getAs[Long]("n_low_outliers") == 0)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-15 late operators: empty inputs yield empty reports, not crashes") {
    val eGv = Seq.empty[(String, Long)].toDF("group", "v")
    assert(Evaluation.wasserstein1(eGv, eGv).isEmpty)
    assert(Evaluation.cramerVonMises(eGv, eGv).isEmpty)
    assert(Evaluation.andersonDarling(eGv, eGv).isEmpty)
    val eArm = Seq.empty[(String, String, Long)].toDF("group", "arm", "v")
    assert(Evaluation.bartlett(eArm).isEmpty)
    assert(Evaluation.jonckheereTerpstra(
      Seq.empty[(String, Long, Long)].toDF("group", "arm", "v")).isEmpty)
    assert(Evaluation.msprt(
      Seq.empty[(String, Long, Long)].toDF("group", "arm", "y")).isEmpty)
    val ePanel = Seq.empty[(String, String, String, Long)]
      .toDF("group", "rater", "item", "score")
    assert(Evaluation.friedmanTest(ePanel).isEmpty)
    assert(Evaluation.pageTrend(ePanel).isEmpty)
    assert(Evaluation.splitHalf(
      ePanel.toDF("group", "subject", "item", "score")).isEmpty)
    val eEvents = Seq.empty[(Long, Long, java.sql.Timestamp, String)]
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(graft.ext.Timeseries.dispersionTest(eEvents).isEmpty)
    assert(graft.ext.Timeseries.hurstRS(eEvents).isEmpty)
    // ljungBox reports one zero row (its rollup is global by design)
    val lb = graft.ext.Timeseries.ljungBox(eEvents).collect().head
    assert(lb.getAs[Long]("m_lags") == 0L && lb.getAs[Double]("q_stat") == 0.0)
    val eEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.operators.Graph.kTruss(eEdges).isEmpty)
    assert(graft.operators.Graph.richClub(eEdges).isEmpty)
    val eEmb = Seq.empty[(Long, Seq[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(graft.ext.Similarity.silhouetteByLabel(eEmb).isEmpty)
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("round-14 operators: empty inputs yield empty reports, not crashes") {
    val eGl = Seq.empty[(String, Long, Long)].toDF("group", "arm", "v_micro")
    assert(Evaluation.mannWhitney(eGl).isEmpty)
    assert(Evaluation.effectSize(eGl.toDF("group", "arm", "y")).isEmpty)
    assert(Evaluation.bhAdjust(
      Seq.empty[(String, String, Long)].toDF("group", "test", "p_micro"))
      .isEmpty)
    assert(Evaluation.mantelHaenszel(Seq.empty[(String, String, Long, Long)]
      .toDF("group", "stratum", "arm", "y")).isEmpty)
    assert(Evaluation.jsDivergence(Seq.empty[(String, Long, String)]
      .toDF("group", "side", "tok")).isEmpty)
    assert(Evaluation.kaplanMeier(Seq.empty[(String, Long, Long)]
      .toDF("group", "t", "event")).isEmpty)
    assert(Evaluation.logRank(Seq.empty[(String, Long, Long, Long)]
      .toDF("group", "arm", "t", "event")).isEmpty)
    assert(Evaluation.cochranQ(Seq.empty[(String, String, String, Long)]
      .toDF("group", "item", "rater", "y")).isEmpty)
    assert(Evaluation.prAuc(Seq.empty[(String, Long, Long)]
      .toDF("group", "score_micro", "y")).isEmpty)
    assert(Evaluation.gwetAC1(Seq.empty[(String, String, String)]
      .toDF("group", "label_a", "label_b")).isEmpty)
    assert(Evaluation.robustLocation(Seq.empty[(String, Long)]
      .toDF("group", "v")).isEmpty)
    assert(Evaluation.rboOverlap(
      Seq.empty[(String, Long, Long)].toDF("group", "item", "score_micro"),
      Seq.empty[(String, Long, Long)].toDF("group", "item", "score_micro"))
      .isEmpty)
    assert(graft.operators.Graph.assortativity(
      Seq.empty[(Long, Long)].toDF("src", "dst")).collect().head
      .getAs[Double]("r") == 0.0) // scalar agg: one all-zero row
    assert(graft.ext.Timeseries.pageHinkley(
      Seq.empty[(String, java.sql.Timestamp)].toDF("event_type", "ts"))
      .isEmpty)
    assert(graft.ext.Timeseries.mannKendall(
      Seq.empty[(String, java.sql.Timestamp)].toDF("event_type", "ts"))
      .isEmpty)
    assert(Evaluation.hillTail(Seq.empty[(String, Long)]
      .toDF("group", "v")).isEmpty)
    assert(graft.ext.Timeseries.seasonalStrength(
      Seq.empty[(String, java.sql.Timestamp)].toDF("event_type", "ts"))
      .isEmpty)
  }

  test("round-14 TVFs: the new statistics answer from SQL") {
    graft.sql.GraftFunctions.register(spark)
    Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L)).toDF("arm", "v_micro")
      .withColumn("group", lit("g")).createOrReplaceTempView("mw_in")
    val z = spark.sql("SELECT z FROM mann_whitney('mw_in')")
      .as[Double].head()
    assert(z != 0.0)
    Seq(("t1", 1000L), ("t2", 900000L)).toDF("test", "p_micro")
      .withColumn("group", lit("f")).createOrReplaceTempView("bh_in")
    assert(spark.sql("SELECT count(*) FROM fdr_bh('bh_in') WHERE reject")
      .as[Long].head() == 1L)
    Seq(("g", 1L, 1), ("g", 3L, 1), ("g", 2L, 0))
      .toDF("group", "t", "event").createOrReplaceTempView("km_in")
    assert(spark.sql("SELECT count(*) FROM kaplan_meier('km_in')")
      .as[Long].head() == 2L)
    Seq((0, 1L), (0, 2L), (0, 3L), (1, 3L), (1, 4L), (1, 5L))
      .toDF("arm", "y").withColumn("group", lit("g"))
      .createOrReplaceTempView("es_in")
    assert(spark.sql("SELECT d FROM effect_size('es_in')")
      .as[Double].head() == 2.0)
    Seq((90L, 1), (10L, 0)).toDF("score_micro", "y")
      .withColumn("group", lit("g")).createOrReplaceTempView("pr_in")
    assert(spark.sql("SELECT pr_auc FROM pr_auc('pr_in')")
      .as[Double].head() == 1.0)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("welchTTest: hand-computed t and Welch-Satterthwaite df; degenerate arm") {
    // arm a: {1,2,3}, arm b: {4,5,7} -> var_a = 1, var_b = 7/3
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 4L), (1, 5L), (1, 7L))
      .toDF("arm", "y").withColumn("group", lit("g"))
    val r = Evaluation.welchTTest(df).collect().head
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == r6(16.0 / 3.0))
    val varA = (3.0 * 14.0 - 36.0) / (3.0 * 2.0)
    val varB = (3.0 * 90.0 - 256.0) / (3.0 * 2.0)
    val sea = varA / 3.0; val seb = varB / 3.0; val se2 = sea + seb
    assert(r.getAs[Double]("t_stat") ==
      r6((16.0 / 3.0 - 6.0 / 3.0) / math.sqrt(se2)))
    assert(r.getAs[Double]("df") ==
      r6(se2 * se2 / (sea * sea / 2.0 + seb * seb / 2.0)))
    // single-row arm -> degenerate by contract
    val thin = Seq((0, 1L), (0, 2L), (1, 9L)).toDF("arm", "y")
      .withColumn("group", lit("g"))
    val tr = Evaluation.welchTTest(thin).collect().head
    assert(tr.getAs[Double]("t_stat") == 0.0 && tr.getAs[Double]("df") == 0.0)
  }

  test("kruskalWallis: textbook tie-free H; single arm degenerate") {
    // arms a={1,2}, b={3,4}, c={5,6}: ranks 1..6, H = 4.571429
    // (micro-rounded pre-sum: each nonzero term 2.285714 -> 4.571428)
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("arm", "v").withColumn("group", lit("g"))
    val r = Evaluation.kruskalWallis(df).collect().head
    assert(r.getAs[Long]("k_arms") == 3 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Double]("h") == 4.571428)
    assert(r.getAs[Double]("h_adj") == 4.571428) // no ties: correction 1
    val one = Seq(("a", 1L), ("a", 2L)).toDF("arm", "v")
      .withColumn("group", lit("g"))
    assert(Evaluation.kruskalWallis(one).collect().head
      .getAs[Double]("h") == 0.0)
  }

  test("brownForsythe: hand-computed F on unequal spreads; even-n medians exact") {
    // a={1,2,3,4} (med2=5), b={10,20,30,40} (med2=50):
    // SSB=81, SSW=50.5, F = 81/(50.5/6) = 9.623762
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
      ("b", 10L), ("b", 20L), ("b", 30L), ("b", 40L))
      .toDF("arm", "v").withColumn("group", lit("g"))
    val r = Evaluation.brownForsythe(df).collect().head
    assert(r.getAs[Long]("k_arms") == 2 && r.getAs[Long]("n") == 8)
    assert(r.getAs[Double]("f") == r6(81.0 / (50.5 / 6.0)))
    // equal spreads -> F = 0 exactly (both deviation sets identical)
    val eq = Seq(("a", 1L), ("a", 3L), ("b", 11L), ("b", 13L))
      .toDF("arm", "v").withColumn("group", lit("g"))
    assert(Evaluation.brownForsythe(eq).collect().head
      .getAs[Double]("f") == 0.0)
  }

  test("kendallW: perfect concordance = 1; incomplete items and dup rows handled") {
    // 3 raters score 4 items identically -> identical rankings, W = 1
    val base = for (r <- Seq("r1", "r2", "r3"); i <- 1 to 4)
      yield (r, s"i$i", i.toLong * 10)
    val df = base.toDF("rater", "item", "score").withColumn("group", lit("g"))
    val w1 = Evaluation.kendallW(df).collect().head
    assert(w1.getAs[Long]("m_raters") == 3 && w1.getAs[Long]("n_items") == 4)
    assert(w1.getAs[Long]("s4") == 180L) // 4S, S = 45
    assert(w1.getAs[Double]("w") == 1.0)
    // an item missing one rater is excluded; a duplicate (rater, item)
    // row collapses to max(score) -> W stays 1 on the complete panel
    val noisy = (base ++ Seq(("r1", "i5", 99L), ("r2", "i5", 98L),
      ("r1", "i1", 1L))).toDF("rater", "item", "score")
      .withColumn("group", lit("g"))
    val w2 = Evaluation.kendallW(noisy).collect().head
    assert(w2.getAs[Long]("n_items") == 4 && w2.getAs[Double]("w") == 1.0)
  }

  test("cronbachAlpha: perfectly correlated items = 1; incomplete subjects excluded") {
    // 2 items, subjects score (1,1),(2,2),(3,3): Σvar_i = 2, var_tot = 4
    val df = Seq(("s1", "q1", 1L), ("s1", "q2", 1L), ("s2", "q1", 2L),
      ("s2", "q2", 2L), ("s3", "q1", 3L), ("s3", "q2", 3L))
      .toDF("subject", "item", "score").withColumn("group", lit("g"))
    val r = Evaluation.cronbachAlpha(df).collect().head
    assert(r.getAs[Long]("k_items") == 2 && r.getAs[Long]("n_subjects") == 3)
    assert(r.getAs[Double]("item_var_sum") == 2.0)
    assert(r.getAs[Double]("total_var") == 4.0)
    assert(r.getAs[Double]("alpha") == 1.0)
    // a subject missing one item drops from the panel entirely
    val sparse = df.union(Seq(("s4", "q1", 9L)).toDF("subject", "item", "score")
      .withColumn("group", lit("g")).select("subject", "item", "score", "group"))
    val r2 = Evaluation.cronbachAlpha(sparse).collect().head
    assert(r2.getAs[Long]("n_subjects") == 3)
    assert(r2.getAs[Double]("alpha") == 1.0)
  }

  test("nelsonAalen: hand-computed cumulative hazard, variance, FH survival") {
    // (t, event): (1,1),(2,1),(2,0),(3,1)
    val df = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 1)).toDF("t", "event")
      .withColumn("group", lit("g"))
    val rows = Evaluation.nelsonAalen(df).collect()
      .map(r => r.getAs[Long]("t") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L).getAs[Long]("n_risk") == 4)
    assert(rows(1L).getAs[Double]("cum_haz") == 0.25)
    assert(rows(1L).getAs[Double]("var_haz") == 0.0625)
    assert(rows(1L).getAs[Double]("fh_surv") == r6(math.exp(-0.25)))
    assert(rows(2L).getAs[Long]("n_risk") == 3)
    assert(rows(2L).getAs[Double]("cum_haz") == 0.583333)
    assert(rows(2L).getAs[Double]("var_haz") == r6(0.0625 + 0.111111111))
    assert(rows(3L).getAs[Long]("n_risk") == 1)
    assert(rows(3L).getAs[Double]("cum_haz") == 1.583333)
    // FH survival keeps estimating where KM pins to zero (d = n_risk)
    assert(rows(3L).getAs[Double]("fh_surv") ==
      r6(math.exp(-1.583333333)))
  }

  test("liftGain: hand-computed two-bucket table; tied cells stay whole") {
    // scores 40,30,20,10 with y = 1,1,0,0 and 2 buckets: the top half
    // captures every positive -> gain 1, lift 2
    val df = Seq((40L, 1), (30L, 1), (20L, 0), (10L, 0))
      .toDF("score_micro", "y").withColumn("group", lit("g"))
    val out = Evaluation.liftGain(df, buckets = 2).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("cum_pos"),
          r.getAs[Double]("gain"), r.getAs[Double]("lift")))).toMap
    assert(out(1L) == ((2L, 2L, 1.0, 2.0)))
    assert(out(2L) == ((2L, 2L, 1.0, 1.0)))
    // a tied score cell lands WHOLE in the bucket of its last row:
    // three tied rows ending at position 3 of 4 -> all in bucket 2
    val tied = Seq((40L, 1), (40L, 1), (40L, 0), (10L, 0))
      .toDF("score_micro", "y").withColumn("group", lit("g"))
    val t = Evaluation.liftGain(tied, buckets = 2).collect()
    assert(t.map(_.getAs[Long]("bucket")).toSet == Set(2L))
    assert(t.head.getAs[Long]("n") == 4L)
    // zero positives -> gain/lift guard to 0
    val none = Seq((40L, 0), (10L, 0)).toDF("score_micro", "y")
      .withColumn("group", lit("g"))
    assert(Evaluation.liftGain(none).collect()
      .forall(r => r.getAs[Double]("gain") == 0.0 &&
        r.getAs[Double]("lift") == 0.0))
  }

  test("postStratifiedAte: hand-computed two-strata effect; thin strata excluded") {
    // stratum A: arm0 {1,3}, arm1 {5,7} -> diff 4, w .5, varT 2
    // stratum B: arm0 {2,4}, arm1 {4,6} -> diff 2, w .5, varT 2
    // stratum C: arm0 only -> excluded
    // ATE = 3, Var = .25*2 + .25*2 = 1, se = 1, z = 3
    val df = Seq(("A", 0, 1L), ("A", 0, 3L), ("A", 1, 5L), ("A", 1, 7L),
      ("B", 0, 2L), ("B", 0, 4L), ("B", 1, 4L), ("B", 1, 6L),
      ("C", 0, 9L), ("C", 0, 11L))
      .toDF("stratum", "arm", "y").withColumn("group", lit("g"))
    val r = Evaluation.postStratifiedAte(df).collect().head
    assert(r.getAs[Long]("n_strata") == 3 && r.getAs[Long]("n_used") == 2)
    assert(r.getAs[Long]("n") == 8)
    assert(r.getAs[Double]("ate") == 3.0)
    assert(r.getAs[Double]("se") == 1.0)
    assert(r.getAs[Double]("z") == 3.0)
    // no usable stratum -> everything guards to 0
    val thin = Seq(("A", 0, 1L), ("A", 1, 2L)).toDF("stratum", "arm", "y")
      .withColumn("group", lit("g"))
    val t = Evaluation.postStratifiedAte(thin).collect().head
    assert(t.getAs[Long]("n_used") == 0 && t.getAs[Double]("z") == 0.0)
  }

  test("quantileNormalize: pooled order statistics; single source is identity") {
    import graft.ext.Curation
    // a={1,2}, b={10,20}: pooled {1,2,10,20}; both sources map to {2,20}
    val df = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L))
      .toDF("source", "v").withColumn("group", lit("g"))
    val out = Curation.quantileNormalize(df).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("v")) ->
        r.getAs[Long]("qn")).toMap
    assert(out(("a", 1L)) == 2L && out(("a", 2L)) == 20L)
    assert(out(("b", 10L)) == 2L && out(("b", 20L)) == 20L)
    // one source: the mapping is the identity (k = cum, boundary = own cell)
    val solo = Seq(("s", 5L), ("s", 5L), ("s", 9L), ("s", 42L))
      .toDF("source", "v").withColumn("group", lit("g"))
    val ident = Curation.quantileNormalize(solo).collect()
    assert(ident.forall(r => r.getAs[Long]("qn") == r.getAs[Long]("v")))
    graft.ext.Checkpoints.releaseAll(spark)
  }

  test("icc21: perfect agreement = 1; pure rater bias penalized to 2/3") {
    // two raters identical on scores (2,4,6): MSE = MSC = 0 -> ICC 1
    val perfect = Seq(("s1", "r1", 2L), ("s1", "r2", 2L), ("s2", "r1", 4L),
      ("s2", "r2", 4L), ("s3", "r1", 6L), ("s3", "r2", 6L))
      .toDF("subject", "rater", "score").withColumn("group", lit("g"))
    val p = Evaluation.icc21(perfect).collect().head
    assert(p.getAs[Long]("n_subjects") == 3 && p.getAs[Long]("k_raters") == 2)
    assert(p.getAs[Double]("icc") == 1.0)
    // r2 = r1 + 1 (constant bias): MSR=2, MSC=1.5, MSE=0 -> ICC(2,1)
    // = 2 / (2 + 2*1.5/3) = 2/3 — absolute agreement sees the bias
    val biased = Seq(("s1", "r1", 1L), ("s1", "r2", 2L), ("s2", "r1", 2L),
      ("s2", "r2", 3L), ("s3", "r1", 3L), ("s3", "r2", 4L))
      .toDF("subject", "rater", "score").withColumn("group", lit("g"))
    val b = Evaluation.icc21(biased).collect().head
    assert(b.getAs[Double]("msr") == 2.0)
    assert(b.getAs[Double]("msc") == 1.5)
    assert(b.getAs[Double]("mse") == 0.0)
    assert(b.getAs[Double]("icc") == 0.666667)
    // a subject missing one rater drops from the panel
    val sparse = biased.union(Seq(("s4", "r1", 9L))
      .toDF("subject", "rater", "score").withColumn("group", lit("g"))
      .select("subject", "rater", "score", "group"))
    assert(Evaluation.icc21(sparse).collect().head
      .getAs[Long]("n_subjects") == 3)
  }

  test("cliffsDelta: dominance 1, tie-heavy 0; shares the MW rank state") {
    // full dominance: every b beats every a
    val dom = Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L))
      .toDF("arm", "v_micro").withColumn("group", lit("g"))
    val r = Evaluation.cliffsDelta(dom).collect().head
    assert(r.getAs[Long]("u2") == 8L)
    assert(r.getAs[Double]("delta") == 1.0)
    assert(r.getAs[String]("magnitude") == "large")
    // all tied: mid-ranks cancel pairwise -> delta 0, negligible
    val tied = Seq((0, 5L), (0, 5L), (1, 5L), (1, 5L))
      .toDF("arm", "v_micro").withColumn("group", lit("g"))
    val t = Evaluation.cliffsDelta(tied).collect().head
    assert(t.getAs[Double]("delta") == 0.0)
    assert(t.getAs[String]("magnitude") == "negligible")
    // the MW spec's half-tied case: u2 = 14 -> delta = 14/9 - 1
    val mw = Seq((0, 1L), (0, 2L), (0, 3L), (1, 2L), (1, 3L), (1, 4L))
      .toDF("arm", "v_micro").withColumn("group", lit("g"))
    val m = Evaluation.cliffsDelta(mw).collect().head
    assert(m.getAs[Double]("delta") == r6(14.0 / 9.0 - 1.0))
    // a finish over the SAME state table as mannWhitney
    val viaState = Evaluation.cliffsDeltaFinish(
      Evaluation.mannWhitneyState(mw)).collect().head
    assert(viaState.getAs[Double]("delta") == m.getAs[Double]("delta"))
  }

  test("hosmerLemeshow: perfectly calibrated bins score 0; degenerate bins excluded") {
    // p = 0.5 over 4 rows with 2 positives and p = 0.25 over 4 rows
    // with 1 positive: every (O - E) is 0 -> HL = 0
    val good = Seq((500000L, 1), (500000L, 1), (500000L, 0), (500000L, 0),
      (250000L, 1), (250000L, 0), (250000L, 0), (250000L, 0))
      .toDF("p_micro", "y")
    val g = Evaluation.hosmerLemeshow(good).collect().head
    assert(g.getAs[Double]("hl") == 0.0)
    assert(g.getAs[Long]("bins_used") == 2)
    assert(g.getAs[Long]("df") == 0)
    // p = 0.5 over 4 rows but ALL positive: (4-2)^2/(2*(1-0.5)) = 4;
    // a p = 0 bin is degenerate (E = 0) and is excluded-and-counted
    val bad = Seq((500000L, 1), (500000L, 1), (500000L, 1), (500000L, 1),
      (0L, 0), (0L, 0)).toDF("p_micro", "y")
    val b = Evaluation.hosmerLemeshow(bad).collect().head
    assert(b.getAs[Double]("hl") == 4.0)
    assert(b.getAs[Long]("n_bins") == 2 && b.getAs[Long]("bins_used") == 1)
  }

  test("partialCorr: confounder-cleared residuals; degenerate marginals guard to 0") {
    // x={1,2,3,4}, y={2,1,4,3}, z={1,1,2,2}: r_xy=0.6, r_xz=r_yz=
    // 8/sqrt(80); controlling z the residuals are perfectly
    // anticorrelated -> partial = (0.6 - 0.8)/0.2 = -1
    val df = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 2L), (4L, 3L, 2L))
      .toDF("x", "y", "z").withColumn("group", lit("g"))
    val r = Evaluation.partialCorr(df).collect().head
    assert(r.getAs[Double]("r_xy") == 0.6)
    assert(r.getAs[Double]("r_xz") == r6(8.0 / math.sqrt(80.0)))
    assert(r.getAs[Double]("r_partial") == -1.0)
    // x == z: |r_xz| = 1, the partial is undefined -> 0 by contract
    val dgen = Seq((1L, 2L, 1L), (2L, 1L, 2L), (3L, 4L, 3L))
      .toDF("x", "y", "z").withColumn("group", lit("g"))
    assert(Evaluation.partialCorr(dgen).collect().head
      .getAs[Double]("r_partial") == 0.0)
  }

  test("round-15 stats TVF surface smoke") {
    import spark.implicits._
    graft.sql.GraftFunctions.register(spark)
    Seq((0, 1L), (0, 2L), (1, 8L), (1, 9L)).toDF("arm", "y")
      .withColumn("group", lit("g")).createOrReplaceTempView("wt_in")
    assert(spark.sql("SELECT t_stat FROM welch_ttest('wt_in')")
      .as[Double].head() > 0.0)
    Seq(("a", 1L), ("a", 2L), ("b", 8L), ("b", 9L)).toDF("arm", "v")
      .withColumn("group", lit("g")).createOrReplaceTempView("kw_in")
    assert(spark.sql("SELECT h FROM kruskal_wallis('kw_in')")
      .as[Double].head() > 0.0)
    assert(spark.sql("SELECT f FROM brown_forsythe('kw_in')")
      .as[Double].head() == 0.0) // equal spreads
    assert(spark.sql("SELECT chi2 FROM bartlett('kw_in')")
      .as[Double].head() == 0.0) // equal variances
    Seq((1L, 1L), (1L, 2L), (2L, 8L), (2L, 9L)).toDF("arm", "v")
      .withColumn("group", lit("g")).createOrReplaceTempView("jt_in")
    assert(spark.sql("SELECT z FROM jonckheere('jt_in')")
      .as[Double].head() > 0.0) // rising trend
    Seq(("r1", "i1", 1L), ("r1", "i2", 2L), ("r2", "i1", 1L),
      ("r2", "i2", 2L)).toDF("rater", "item", "score")
      .withColumn("group", lit("g")).createOrReplaceTempView("kwc_in")
    assert(spark.sql("SELECT w FROM kendall_w('kwc_in')")
      .as[Double].head() == 1.0)
    // Friedman off the same state: chi2 = m(n−1)W = 2·1·1 = 2
    assert(spark.sql("SELECT chi2_f FROM friedman_test('kwc_in')")
      .as[Double].head() == 2.0)
    Seq(("s1", "q1", 1L), ("s1", "q2", 1L), ("s2", "q1", 3L),
      ("s2", "q2", 3L)).toDF("subject", "item", "score")
      .withColumn("group", lit("g")).createOrReplaceTempView("ca_in")
    assert(spark.sql("SELECT alpha FROM cronbach_alpha('ca_in')")
      .as[Double].head() == 1.0)
    Seq((1L, 1), (2L, 0)).toDF("t", "event")
      .withColumn("group", lit("g")).createOrReplaceTempView("na_in")
    assert(spark.sql("SELECT count(*) FROM nelson_aalen('na_in')")
      .as[Long].head() == 1L)
  }

  test("late round-15 TVF surface: every new function answers from SQL") {
    import spark.implicits._
    graft.sql.GraftFunctions.register(spark)
    Seq(("g", 0L), ("g", 1L)).toDF("group", "v")
      .createOrReplaceTempView("dr_a")
    Seq(("g", 1L), ("g", 2L)).toDF("group", "v")
      .createOrReplaceTempView("dr_b")
    assert(spark.sql("SELECT w1 FROM wasserstein('dr_a', 'dr_b')")
      .as[Double].head() == 1.0)
    assert(spark.sql("SELECT a2 FROM ad_test('dr_a', 'dr_b')")
      .as[Double].head() == 1.25)
    Seq(("r1", "i1", 1L), ("r1", "i2", 2L), ("r2", "i1", 1L),
      ("r2", "i2", 2L)).toDF("rater", "item", "score")
      .withColumn("group", lit("g")).createOrReplaceTempView("pg_in")
    assert(spark.sql("SELECT trend FROM page_trend('pg_in')")
      .as[Long].head() == 1L)
    Seq(("s1", "a", 1L), ("s1", "b", 2L), ("s2", "a", 2L), ("s2", "b", 4L))
      .toDF("subject", "item", "score").withColumn("group", lit("g"))
      .createOrReplaceTempView("sh_in")
    assert(spark.sql("SELECT sb FROM split_half('sh_in')")
      .as[Double].head() == 1.0)
    Seq((0, 1L), (0, 2L), (1, 1L), (1, 2L)).toDF("arm", "y")
      .withColumn("group", lit("g")).createOrReplaceTempView("ms_in")
    assert(spark.sql("SELECT p_always FROM msprt('ms_in', 1.0)")
      .as[Double].head() == 1.0)
    Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
      .createOrReplaceTempView("tr_in")
    assert(spark.sql("SELECT count(*) FROM k_truss('tr_in', 3)")
      .as[Long].head() == 3L) // a triangle is its own 3-truss
    assert(spark.sql("SELECT max(phi) FROM rich_club('tr_in')")
      .as[Double].head() == 1.0)
    Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 10L)).toDF("group", "v")
      .createOrReplaceTempView("gv_in")
    assert(spark.sql("SELECT gini FROM gini_value('gv_in')")
      .as[Double].head() == 0.75)
    Seq((1L, Seq(0f, 0f), 0), (2L, Seq(0f, 0f), 0),
      (3L, Seq(1f, 1f), 1), (4L, Seq(1f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("sil_in")
    assert(spark.sql("SELECT min(silhouette) FROM silhouette('sil_in')")
      .as[Double].head() == 1.0)
    (0 until 16).map(i => (i.toLong, i.toLong,
        java.sql.Timestamp.valueOf(f"2026-03-${i + 1}%02d 00:00:00"), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .createOrReplaceTempView("hr_in")
    assert(spark.sql("SELECT count(*) FROM hurst_rs('hr_in')")
      .as[Long].head() >= 1L)
    assert(spark.sql("SELECT vmr FROM dispersion_test('hr_in')")
      .as[Double].head() == 0.0) // one event per day: constant series
  }

  test("wasserstein1: unit mean shift costs exactly 1; identical -> 0; empty side") {
    // A = {0,1}, B = {1,2}: F gaps of 1/2 over two unit intervals
    // -> W1 = 1 (num |cumA·nB − cumB·nA|·Δv = 2 + 2 over nA·nB = 4)
    val a = Seq(("g", 0L), ("g", 1L)).toDF("group", "v")
    val b = Seq(("g", 1L), ("g", 2L)).toDF("group", "v")
    val r = Evaluation.wasserstein1(a, b).collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("w1_num") == 4L)
    assert(r.getAs[Double]("w1") == 1.0)
    // identical samples -> 0 where KS would also be 0
    val same = Evaluation.wasserstein1(a, a).collect().head
    assert(same.getAs[Long]("w1_num") == 0L &&
      same.getAs[Double]("w1") == 0.0)
    // a missing side has no finite distance: 0 with its count zeroed
    val none = Seq.empty[(String, Long)].toDF("group", "v")
    val e = Evaluation.wasserstein1(a, none).collect().head
    assert(e.getAs[Long]("n_b") == 0 && e.getAs[Double]("w1") == 0.0)
    // a SECOND FINISH over the ksTest state: same (grp, v) accumulator
    val tagged = a.select(col("group").as("grp"), col("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col("group").as("grp"), col("v"),
        lit(1L).as("side")))
    val viaState = Evaluation.w1Finish(Evaluation.ksState(tagged))
      .collect().head
    assert(viaState.getAs[Double]("w1") == r.getAs[Double]("w1"))
  }

  test("msprt: hand-computed log-lambda on a strong effect; null and degenerate report p = 1") {
    // a = {1,2,3}, b = {11,12,13}, tau = 1: varA = varB = 1,
    // se2 = 2/3, delta = 10 -> logLam = 0.5·ln(0.4) + 100/(2·(2/3)·(5/3))
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 11L), (1, 12L), (1, 13L))
      .toDF("arm", "y").withColumn("group", lit("g"))
    val r = Evaluation.msprt(df, tau = 1.0).collect().head
    val expect = 0.5 * math.log((2.0 / 3.0) / (2.0 / 3.0 + 1.0)) +
      100.0 * 1.0 / (2.0 * (2.0 / 3.0) * (2.0 / 3.0 + 1.0))
    assert(r.getAs[Double]("delta") == 10.0)
    assert(r.getAs[Double]("log_lambda") == r6(expect))
    assert(r.getAs[Double]("p_always") == 0.0) // exp(-44.5) under 6dp
    // identical arms: delta 0, logLam < 0 -> p capped at 1
    val same = Seq((0, 1L), (0, 2L), (1, 1L), (1, 2L))
      .toDF("arm", "y").withColumn("group", lit("g"))
    val s = Evaluation.msprt(same, tau = 1.0).collect().head
    assert(s.getAs[Double]("p_always") == 1.0)
    // a one-row arm cannot estimate a variance -> degenerate p = 1
    val dgen = Seq((0, 1L), (0, 2L), (1, 5L))
      .toDF("arm", "y").withColumn("group", lit("g"))
    assert(Evaluation.msprt(dgen, tau = 1.0).collect().head
      .getAs[Double]("p_always") == 1.0)
  }

  test("splitHalf: perfectly correlated halves -> SB 1; anti-correlated guards to 0") {
    // items a (half 1), b (half 0); y = 2x across subjects -> r = 1
    val df = Seq(("s1", "a", 1L), ("s1", "b", 2L),
      ("s2", "a", 2L), ("s2", "b", 4L), ("s3", "a", 3L), ("s3", "b", 6L),
      ("s4", "a", 9L)) // incomplete subject: excluded by the census
      .toDF("subject", "item", "score").withColumn("group", lit("g"))
    val r = Evaluation.splitHalf(df).collect().head
    assert(r.getAs[Long]("k_items") == 2 && r.getAs[Long]("n_subjects") == 3)
    assert(r.getAs[Double]("r_halves") == 1.0)
    assert(r.getAs[Double]("sb") == 1.0)
    // y falls as x rises: r = -1, the Spearman-Brown step-up is
    // undefined (1 + r = 0) -> 0 by contract
    val anti = Seq(("s1", "a", 1L), ("s1", "b", 6L),
      ("s2", "a", 2L), ("s2", "b", 4L), ("s3", "a", 3L), ("s3", "b", 2L))
      .toDF("subject", "item", "score").withColumn("group", lit("g"))
    val a = Evaluation.splitHalf(anti).collect().head
    assert(a.getAs[Double]("r_halves") == -1.0)
    assert(a.getAs[Double]("sb") == 0.0)
  }

  test("bartlett: equal variances -> 0; hand-computed unequal case; zero-var arm excluded") {
    // arm0 {1,3}, arm1 {5,7}: both s² = 2 -> chi2 rounds to 0
    val eq = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L))
      .toDF("arm", "v").withColumn("group", lit("g"))
    val e = Evaluation.bartlett(eq).collect().head
    assert(e.getAs[Long]("k_used") == 2 && e.getAs[Long]("dof") == 1)
    assert(e.getAs[Double]("chi2") == 0.0)
    // arm0 {0,2} s²=2, arm1 {0,6} s²=18: sp²=10, lns micro-rounded
    // = (693147 + 2890372)/1e6, C = 1.5
    val uneq = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 6L))
      .toDF("arm", "v").withColumn("group", lit("g"))
    val u = Evaluation.bartlett(uneq).collect().head
    assert(u.getAs[Double]("chi2") ==
      r6((2.0 * math.log(10.0) - 3.583519) / 1.5))
    // a constant arm has no log-variance: excluded-and-counted,
    // k_used = 1 -> degenerate 0
    val dgen = Seq(("a", 5L), ("a", 5L), ("b", 1L), ("b", 3L))
      .toDF("arm", "v").withColumn("group", lit("g"))
    val d0 = Evaluation.bartlett(dgen).collect().head
    assert(d0.getAs[Long]("k_arms") == 2 && d0.getAs[Long]("k_used") == 1)
    assert(d0.getAs[Double]("chi2") == 0.0)
  }

  test("jonckheereTerpstra: perfect monotone trend; all-tied panel z = 0") {
    // arms 1<2<3 with strictly increasing values: 2J = 24, E[2J] = 12,
    // var = 456/72 (no ties) -> z = 12 / (2·sqrt(456/72))
    val up = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (3L, 6L))
      .toDF("arm", "v").withColumn("group", lit("g"))
    val r = Evaluation.jonckheereTerpstra(up).collect().head
    assert(r.getAs[Long]("k_arms") == 3 && r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("j2") == 24L && r.getAs[Long]("e2j") == 12L)
    assert(r.getAs[Double]("z") ==
      r6(12.0 / (2.0 * math.sqrt(456.0 / 72.0))))
    // reversing the arm order flips the sign exactly
    val down = up.withColumn("arm", lit(4L) - col("arm"))
    assert(Evaluation.jonckheereTerpstra(down).collect().head
      .getAs[Double]("z") == -r.getAs[Double]("z"))
    // every value tied: 2J = E[2J] and the variance degenerates -> 0
    val tied = up.withColumn("v", lit(7L))
    val t = Evaluation.jonckheereTerpstra(tied).collect().head
    assert(t.getAs[Long]("j2") == t.getAs[Long]("e2j"))
    assert(t.getAs[Double]("z") == 0.0)
  }

  test("pageTrend: rising panel chi2 = 6 with trend +1; flip reverses; ties flatten to 0") {
    // 3 raters score items a<b<c rising: L = m·Σj² = 42, l2 = 84,
    // num = 6·84 − 3·3·3·16 = 72, den = 3·9·4·8 = 864 -> chi2 = 6
    def panel(scores: Map[String, Long]) =
      (for (r <- Seq("r1", "r2", "r3"); (i, s) <- scores.toSeq)
        yield (r, i, s)).toDF("rater", "item", "score")
        .withColumn("group", lit("g"))
    val up = Evaluation.pageTrend(
      panel(Map("a" -> 10L, "b" -> 20L, "c" -> 30L))).collect().head
    assert(up.getAs[Long]("l2") == 84L)
    assert(up.getAs[Double]("chi2_l") == 6.0)
    assert(up.getAs[Long]("trend") == 1L)
    // scores falling along the item order: same evidence, sign flips
    val down = Evaluation.pageTrend(
      panel(Map("a" -> 30L, "b" -> 20L, "c" -> 10L))).collect().head
    assert(down.getAs[Double]("chi2_l") == 6.0)
    assert(down.getAs[Long]("trend") == -1L)
    // every rater ties every item: mid-ranks level, L sits at its
    // null mean -> chi2 0, no direction
    val flat = Evaluation.pageTrend(
      panel(Map("a" -> 5L, "b" -> 5L, "c" -> 5L))).collect().head
    assert(flat.getAs[Double]("chi2_l") == 0.0)
    assert(flat.getAs[Long]("trend") == 0L)
  }

  test("cramerVonMises: hand-computed pooled squared gaps; identical -> 0") {
    // A = {0,1}, B = {1,2}: gaps 1/2, 1/2, 0 with pooled weights
    // 1, 2, 1 -> sum w·gap² = 0.75; T = (4/16)·0.75 = 0.1875
    val a = Seq(("g", 0L), ("g", 1L)).toDF("group", "v")
    val b = Seq(("g", 1L), ("g", 2L)).toDF("group", "v")
    val r = Evaluation.cramerVonMises(a, b).collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("cvm") == 0.1875)
    // identical samples -> every gap is 0
    assert(Evaluation.cramerVonMises(a, a).collect().head
      .getAs[Double]("cvm") == 0.0)
    // empty side -> 0 with the count zeroed (the wasserstein contract)
    val none = Seq.empty[(String, Long)].toDF("group", "v")
    val e = Evaluation.cramerVonMises(a, none).collect().head
    assert(e.getAs[Long]("n_b") == 0 && e.getAs[Double]("cvm") == 0.0)
    // THIRD finish over the ksTest state
    val tagged = a.select(col("group").as("grp"), col("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col("group").as("grp"), col("v"),
        lit(1L).as("side")))
    val viaState = Evaluation.cvmFinish(Evaluation.ksState(tagged))
      .collect().head
    assert(viaState.getAs[Double]("cvm") == r.getAs[Double]("cvm"))
  }

  test("andersonDarling: hand-computed midrank A2; identical -> 0; empty side") {
    // A = {0,1}, B = {1,2}: terms 0.25 + 0.75 + 0.25 -> A2 = 1.25
    val a = Seq(("g", 0L), ("g", 1L)).toDF("group", "v")
    val b = Seq(("g", 1L), ("g", 2L)).toDF("group", "v")
    val r = Evaluation.andersonDarling(a, b).collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("a2") == 1.25)
    // identical samples: every numerator N·m2 − n_a·b2 is 0
    assert(Evaluation.andersonDarling(a, a).collect().head
      .getAs[Double]("a2") == 0.0)
    // empty side -> 0 with the count zeroed (the wasserstein contract)
    val none = Seq.empty[(String, Long)].toDF("group", "v")
    val e = Evaluation.andersonDarling(a, none).collect().head
    assert(e.getAs[Long]("n_b") == 0 && e.getAs[Double]("a2") == 0.0)
    // FOURTH finish over the ksTest state
    val tagged = a.select(col("group").as("grp"), col("v"),
        lit(0L).as("side"))
      .unionAll(b.select(col("group").as("grp"), col("v"),
        lit(1L).as("side")))
    assert(Evaluation.adFinish(Evaluation.ksState(tagged)).collect().head
      .getAs[Double]("a2") == r.getAs[Double]("a2"))
  }

  test("friedmanTest: perfect concordance chi2 = m(n-1); identity with kendallW") {
    // 3 raters rank 4 items identically -> W = 1, chi2 = 3·(4−1)·1 = 9
    val base = for (r <- Seq("r1", "r2", "r3"); i <- 1 to 4)
      yield (r, s"i$i", i.toLong * 10)
    val df = base.toDF("rater", "item", "score").withColumn("group", lit("g"))
    val f = Evaluation.friedmanTest(df).collect().head
    assert(f.getAs[Long]("m_raters") == 3 && f.getAs[Long]("n_items") == 4)
    assert(f.getAs[Long]("dof") == 3L)
    assert(f.getAs[Double]("chi2_f") == 9.0)
    // partial agreement with a tie: chi2_f tracks m(n−1)·w
    val mixed = Seq(
      ("r1", "i1", 1L), ("r1", "i2", 2L), ("r1", "i3", 3L),
      ("r2", "i1", 2L), ("r2", "i2", 1L), ("r2", "i3", 3L),
      ("r3", "i1", 1L), ("r3", "i2", 1L), ("r3", "i3", 2L))
      .toDF("rater", "item", "score").withColumn("group", lit("g"))
    val w = Evaluation.kendallW(mixed).collect().head.getAs[Double]("w")
    val chi = Evaluation.friedmanTest(mixed).collect().head
      .getAs[Double]("chi2_f")
    assert(math.abs(chi - 3.0 * 2.0 * w) < 1e-4, s"chi=$chi w=$w")
  }
}
