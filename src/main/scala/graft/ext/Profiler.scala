package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Schema-driven column profiling — the data-quality sweep a warehouse
  * runs before trusting a new source: per-column non-null and distinct
  * counts in ONE pass over the data (all aggregates in a single
  * hash-agg; the per-column rows are exploded from the one aggregated
  * row, not from per-column scans).
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = explode(array(cols.map(c => struct(
      lit(c).as("column_name"),
      col(s"__nn_$c").as("n_nonnull"),
      col(s"__nd_$c").as("n_distinct"))): _*)).as("p")
    row.select(col("__n").as("n_rows"), stacked)
      .select(col("p.column_name"), col("n_rows"),
        col("p.n_nonnull"), col("p.n_distinct"))
  }

  /** Join/aggregation-key skew report — the diagnostic you run BEFORE
    * a 100 TB shuffle, because one hot key turns a 1000-executor
    * stage into a single straggler: per-key counts collapse to ONE
    * summary row with the hottest key, its share of all rows, and
    * the Shannon entropy of the key distribution (entropy near
    * ln(n_keys) = uniform = safe; low entropy = concentrated = salt
    * or AQE-skew-join before shuffling on it).
    *
    * Portability: share is integer-micro truncating division; each
    * key's −p·ln p term is micro-rounded BEFORE the sum (the
    * summation-order rule), so the entropy replays exactly. Scale
    * shape: one keyed count shuffle (map-side combined), a scalar
    * total folded back as a literal-free cross join of ONE row, a
    * TakeOrdered(1) for the hot key — the report is O(1) rows.
    *
    * @return one row (n_rows, n_keys, hot_key, hot_n,
    *         hot_share_micro, entropy_micro).
    */
  /** Benford expected first-digit shares in micro units — ONE Scala
    * computation injected into both engines (the periodogramFactors
    * discipline): p_d = log₁₀(1 + 1/d), d ∈ 1..9. */
  val benfordExpectedMicro: Seq[(Int, Long)] =
    (1 to 9).map(d => (d, math.round(math.log10(1.0 + 1.0 / d) * 1e6)))

  /** Benford's-law conformity per group over a positive long column —
    * the classic fabricated-numbers / broken-ETL detector (amounts
    * whose first digits drift from log₁₀(1+1/d) signal synthesized or
    * truncated data): per digit, observed count and share deviation;
    * every row carries the group's MAD (mean absolute deviation, the
    * Nigrini conformity statistic — < 6000 micro ≈ close conformity).
    *
    * Exactness: the first significant digit of a LONG extracts via
    * decimal string — identical in any engine (no float log10 at the
    * boundary); shares are single divisions of exact longs,
    * micro-rounded per digit BEFORE the MAD sum; the expected shares
    * come micro-rounded from [[benfordExpectedMicro]].
    *
    * Scale shape: one (group, digit) count shuffle (map-side
    * combined), then a ≤ 9-row-per-group grid built from the
    * broadcast expected table — nothing corpus-proportional after
    * the first aggregate. Non-positive and NULL values are skipped
    * (Benford applies to positive magnitudes).
    *
    * @param valueCol long-castable positive magnitudes (pre-scale
    *                 currency to cents upstream — exactness needs
    *                 integers)
    * @return (grp, digit, n_digit, n, p_micro, dev_micro, mad_micro) */
  def benford(df: DataFrame, valueCol: String,
      groupCol: String = "group"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast(LongType)
    val digits = df
      .select(col(groupCol).as("grp"), v.as("v"))
      .filter(col("v").isNotNull && col("v") > 0L)
      .select(col("grp"),
        substring(col("v").cast(StringType), 1, 1).cast(IntegerType)
          .as("digit"))
      .groupBy("grp", "digit").agg(count(lit(1)).as("n_digit"))
    val totals = digits.groupBy(col("grp").as("tg"))
      .agg(sum(col("n_digit")).as("n"))
    val expected = benfordExpectedMicro.toDF("digit", "p_micro")
    // full 9-digit grid per group (zero-observed digits deviate too)
    val grid = totals
      .crossJoin(broadcast(expected))
      .join(digits,
        col("tg") === col("grp") && digits("digit") === expected("digit"),
        "left")
      .select(col("tg").as("grp"), expected("digit"), col("n"),
        coalesce(col("n_digit"), lit(0L)).as("n_digit"), col("p_micro"))
      .withColumn("dev_micro",
        round(col("n_digit").cast(DoubleType) * 1e6 /
          col("n").cast(DoubleType), 0).cast(LongType) - col("p_micro"))
    val mad = grid.groupBy(col("grp").as("mg"))
      .agg(round(sum(abs(col("dev_micro"))).cast(DoubleType) / 9.0, 0)
        .cast(LongType).as("mad_micro"))
    grid.join(broadcast(mad), col("grp") === col("mg"))
      .select(col("grp"), col("digit"), col("n_digit"), col("n"),
        col("p_micro"), col("dev_micro"), col("mad_micro"))
  }

  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds totals, the hot key, and the entropy
    val totals = counts.agg(sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val hot = counts.orderBy(col("n").desc, col("k")).limit(1)
      .select(col("k").as("hot_key"), col("n").as("hot_n"))
    val entropy = counts.crossJoin(totals.select(col("n_rows").as("tot")))
      .select(round(-(col("n").cast("double") / col("tot")) *
          log(col("n").cast("double") / col("tot")) * 1e6, 0)
        .cast("long").as("term"))
      .agg(sum(col("term")).as("entropy_micro"))
    totals.crossJoin(hot).crossJoin(entropy)
      .select(col("n_rows"), col("n_keys"), col("hot_key"), col("hot_n"),
        expr("hot_n * 1000000 div n_rows").as("hot_share_micro"),
        col("entropy_micro"))
  }

  /** EXACT five-number summary with Tukey fences per group — the
    * boxplot table [[graft.ext.Sketches.quantileSketch]] only
    * approximates: min/Q1/median/Q3/max plus 1.5·IQR fence outlier
    * counts, the first profile anyone draws of a metric column.
    *
    * Conventions, pinned so both engines agree bit-for-bit: the
    * median is the DOUBLED lo+hi order-statistic pair (the
    * [[graft.ext.Evaluation.brownForsythe]] discipline — even n
    * midpoints stay exact, one /2.0 at publication); Q1/Q3 are
    * inverse-ECDF (type-1) values at positions ⌈n/4⌉ and ⌈3n/4⌉ —
    * single data values, exact longs; fences compare in DOUBLED
    * units (2v vs 2Q1 − 3·IQR) so the half-step of 1.5·IQR never
    * leaves integer arithmetic. n < 4 still reports (the quartile
    * positions degenerate onto order statistics that exist).
    *
    * Scale shape: one (group, value) count shuffle map-side
    * combined; cumulative windows over distinct values only; the
    * fence pass re-reads the same checkpointed cell table against a
    * broadcast groups-sized fence table.
    *
    * @param df rows with `groupCol`, `vCol` (long-castable)
    * @return (grp, n, v_min, q1, median, q3, v_max, iqr,
    *         n_low_outliers, n_high_outliers) — median 6dp */
  def boxplotStats(df: DataFrame, groupCol: String = "group",
      vCol: String = "v"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(col(groupCol).as("grp"),
        col(vCol).cast(LongType).as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the order-stat scan AND the fences
    val wCum = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("grp")
    val scanned = cells
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val stats = scanned.groupBy("grp").agg(
      max(col("n")).as("n"), min(col("v")).as("v_min"),
      max(col("v")).as("v_max"),
      min(when(col("cum") >= expr("(n + 3) div 4"), col("v"))).as("q1"),
      min(when(col("cum") >= expr("(n + 1) div 2"), col("v"))).as("m_lo"),
      min(when(col("cum") >= expr("n div 2 + 1"), col("v"))).as("m_hi"),
      min(when(col("cum") >= expr("(3 * n + 3) div 4"), col("v"))).as("q3"))
    val fences = stats.select(col("grp").as("fg"), col("q1"), col("q3"),
      (lit(2L) * col("q1") - lit(3L) * (col("q3") - col("q1"))).as("lo2"),
      (lit(2L) * col("q3") + lit(3L) * (col("q3") - col("q1"))).as("hi2"))
    val outliers = cells.join(broadcast(fences), col("grp") === col("fg"))
      .groupBy(col("grp")).agg(
        sum(when(lit(2L) * col("v") < col("lo2"), col("cnt"))
          .otherwise(0L)).as("n_low_outliers"),
        sum(when(lit(2L) * col("v") > col("hi2"), col("cnt"))
          .otherwise(0L)).as("n_high_outliers"))
    val out = stats.join(outliers, Seq("grp"))
      .select(col("grp"), col("n"), col("v_min"), col("q1"),
        round((col("m_lo") + col("m_hi")).cast(DoubleType) / 2.0, 6)
          .as("median"),
        col("q3"), col("v_max"), (col("q3") - col("q1")).as("iqr"),
        col("n_low_outliers"), col("n_high_outliers"))
      .localCheckpoint()
    graft.ext.Checkpoints.release(cells)
    out
  }
}
