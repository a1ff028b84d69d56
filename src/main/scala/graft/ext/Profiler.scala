package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
