package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.Md5Hash60

/** Poisson bootstrap (Chamandy/Muralidharan/Najmi/Naidu, "Estimating
  * uncertainty for massive data streams", Google 2012): confidence
  * intervals on massive data WITHOUT resampling passes. Classic
  * bootstrap draws B samples-with-replacement — B full shuffles of a
  * 100 TB table. The Poisson trick: in replicate b, each row's
  * multiplicity is an independent Poisson(1) draw, so ONE pass
  * computes all B weighted sums map-side (the per-row B-fold fan-out
  * collapses into the partial aggregate; the shuffle carries
  * groups×B partial rows, never data-sized).
  *
  * Engine-agreement discipline: the Poisson(1) draw is the count of
  * 60-bit PRE-SCALED long thresholds ≤ hash60("bs|b|id") — pure
  * integer comparisons against [[thresholds60]] (no float inverse-CDF
  * at row scope); replicate means are exact-long ratios finished with
  * one truncating div; the CI bounds are fixed order statistics
  * (rank loRank / hiRank of the B means, ties broken by replicate
  * id), not interpolated percentiles.
  */
object Bootstrap {

  /** Poisson(1) CDF at k = 0..7, pre-scaled to 60-bit longs:
    * T_k = floor(cdf_k · 2^60). A draw's multiplicity is the number
    * of thresholds ≤ the row's 60-bit hash (k capped at 8 — P ≈ 1e-6
    * tail). Single source of truth: the DuckDB oracle renders these
    * same longs. */
  val thresholds60: Seq[Long] = {
    val e1 = math.exp(-1.0)
    var p = e1
    var cdf = 0.0
    (0 until 8).map { k =>
      cdf += p
      p = p / (k + 1)
      (cdf * math.pow(2, 60)).toLong
    }
  }

  /** Per-group point estimate and bootstrap CI of the MEAN of
    * `valueMicro`.
    *
    * @param loRank/hiRank order statistics of the B replicate means
    *   used as the interval (defaults: 3rd and 98th of B=100 ≈ a 95%
    *   interval)
    * @return (group, n, point_milli, lo_milli, hi_milli)
    */
  def poissonMeanCI(df: DataFrame, groupCol: String, valueMicro: Column,
      idCol: String, b: Int = 100, loRank: Int = 3,
      hiRank: Int = 98): DataFrame = {
    require(1 <= loRank && loRank <= hiRank && hiRank <= b, "bad ranks")
    val base = df.select(col(groupCol), valueMicro.cast("long").as("__v"),
      col(idCol).cast("string").as("__id"))
    // point estimate: exact mean in milli-units
    val point = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s"))
      .select(col(groupCol), col("n"),
        expr("(s * 1000) div n").as("point_milli"))
    // ONE md5 per ROW (not per row×replicate — at B=50 that md5 was
    // 90% of the runtime): the digest's two independent 60-bit halves
    // seed an affine per-replicate stream u_b = (h1 + b·h2') mod 2^60
    // — the classic 2-universal construction; across rows the draws
    // are independent, which is what the replicate means average
    // over. h2' is cut to 53 bits so b·h2' stays far inside int64:
    // DuckDB BIGINT errors on overflow rather than wrapping, so the
    // oracle could not replay a wrapping product.
    val h1 = Md5Hash60.hash60(concat(lit("bs|"), col("__id")))
    val h2 = Md5Hash60.hash60(concat(lit("bs|"), col("__id")), second = true)
    val weighted = base
      .withColumn("h1", h1)
      .withColumn("h2b", h2 % lit(9007199254740992L)) // 2^53
      .select(col(groupCol), col("__v"), col("h1"), col("h2b"),
        explode(sequence(lit(0), lit(b - 1))).as("b"))
      .withColumn("hv",
        (col("h1") + col("b") * col("h2b")) % lit(1152921504606846976L)) // 2^60
      // codegen'd threshold count (a filter() higher-order lambda here
      // evaluates interpreted 8× per row — it was half the runtime)
      .withColumn("w", thresholds60
        .map(t => when(col("hv") >= t, 1).otherwise(0)).reduce(_ + _))
      .groupBy(col(groupCol), col("b"))
      .agg(sum(col("w").cast("long") * col("__v")).as("num"),
        sum(col("w").cast("long")).as("den"))
      .filter(col("den") > 0)
      .select(col(groupCol), col("b"), expr("(num * 1000) div den").as("mean_milli"))
    val ranked = weighted.withColumn("rn", row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(col("mean_milli"), col("b"))))
    point
      .join(ranked.filter(col("rn") === loRank)
        .select(col(groupCol), col("mean_milli").as("lo_milli")), groupCol)
      .join(ranked.filter(col("rn") === hiRank)
        .select(col(groupCol), col("mean_milli").as("hi_milli")), groupCol)
  }
}
