package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._

/** BigQuery-surface functions registered as real SQL functions —
  * Catalyst expression compositions (tier (b) of the extension
  * preference order: no custom Expression class is needed because
  * every semantic decomposes into codegen'd built-ins; SURVEY §4).
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for `SparkSession.builder.withExtensions`
  *  - [[GraftFunctions.register]] for a live session (temp functions)
  *
  * After registration, `spark.sql` accepts e.g.
  * `st_distance(st_geogpoint(lon1, lat1), st_geogpoint(lon2, lat2))`
  * (meters, haversine) and `regexp_contains(s, pattern)` directly —
  * no textual rewrite required.
  */
object GraftFunctions {

  private def lit(d: Double): Expression = Literal(d)
  private def field(e: Expression, name: String): Expression =
    UnresolvedExtractValue(e, Literal(name))

  /** st_geogpoint(lon, lat) -> struct<lon,lat> (SURVEY D6: no native
    * geo type; a typed coordinate pair carries the semantics). */
  def stGeogpoint(args: Seq[Expression]): Expression =
    CreateNamedStruct(Seq(Literal("lon"), args(0), Literal("lat"), args(1)))

  /** st_distance(p1, p2) in meters — haversine, sphere R=6371008.8 m
    * (locations_clean.sql:48; spheroid divergence ≤0.5%, SURVEY §7.3). */
  def stDistance(args: Seq[Expression]): Expression = {
    val (lat1, lon1) = (field(args(0), "lat"), field(args(0), "lon"))
    val (lat2, lon2) = (field(args(1), "lat"), field(args(1), "lon"))
    def rad(e: Expression) = ToRadians(e)
    val dLat = Divide(rad(Subtract(lat2, lat1)), lit(2.0))
    val dLon = Divide(rad(Subtract(lon2, lon1)), lit(2.0))
    val a = Add(
      Pow(Sin(dLat), lit(2.0)),
      Multiply(Multiply(Cos(rad(lat1)), Cos(rad(lat2))), Pow(Sin(dLon), lit(2.0))))
    Multiply(Multiply(lit(6371008.8), lit(2.0)), Asin(Sqrt(a)))
  }

  /** regexp_contains(s, pattern) -> s RLIKE pattern. */
  def regexpContains(args: Seq[Expression]): Expression = RLike(args(0), args(1))

  /** date_diff_years(a, b) — BigQuery DATE_DIFF(a, b, YEAR) boundary
    * crossings (user_base.sql:50-54). */
  def dateDiffYears(args: Seq[Expression]): Expression =
    Subtract(Year(args(0)), Year(args(1)))

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_geogpoint" -> stGeogpoint _,
    "st_distance" -> stDistance _,
    "regexp_contains" -> regexpContains _,
    "date_diff_years" -> dateDiffYears _,
    // native codegen'd ANN hot-loop (graft.expressions.DotProduct)
    "dot_product" -> ((args: Seq[Expression]) =>
      graft.expressions.DotProduct(args(0), args(1))),
    // geo radius predicate; RewriteStDWithin expands it to a pushed
    // bounding box + exact residual (graft.plans.GeoRules)
    "st_dwithin" -> ((args: Seq[Expression]) =>
      graft.expressions.StDWithin(args(0), args(1), args(2), args(3), args(4))))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `SparkSession.builder.withExtensions(new GraftExtensions)` — the
  * injection path for sessions created with the functions from the
  * start. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.sql.GraftFunctions", name), builder))
    }
    // geo radius predicate → pushed bounding box + exact residual
    e.injectOptimizerRule(_ => graft.plans.RewriteStDWithin)
  }
}
