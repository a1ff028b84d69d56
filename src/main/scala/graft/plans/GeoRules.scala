package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.expressions.StDWithin

/** Expands [[StDWithin]] radius predicates with a literal-center,
  * literal-radius query into
  *
  *   (lat BETWEEN clat±dLat AND lon BETWEEN clon±dLon)  AND  exact
  *
  * The bounding box is CONSERVATIVE (a strict superset of the circle:
  * under-estimated miles-per-degree, longitude width taken at the
  * box's extreme latitude), so the exact haversine residual — the
  * same codegen'd built-in composition `BqFunctions.haversineMiles`
  * compiles to — keeps the answer identical; the box only prunes.
  *
  * Why this matters at 100 TB: the box legs are plain literal
  * comparisons on the point columns, so FileSourceStrategy pushes
  * them into the parquet scan (footer min/max row-group pruning, and
  * partition pruning if the table is laid out by a location key — or
  * by [[graft.operators.ZOrder]] z-value, which bounds BOTH
  * coordinates per file). The transcendental residual then runs only
  * on rows inside the box instead of the whole corpus.
  *
  * Skipped (predicate left as the exact fallback) when: the center or
  * radius is non-literal, the radius is non-positive, the box would
  * cross a pole, or it would cross the antimeridian — correctness
  * first, the rewrite is purely an optimization.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`; both run before physical
  * planning, which is when scan pushdown is decided.
  */
object RewriteStDWithin extends Rule[LogicalPlan] {

  private val MilesPerDegree = 69.0 // < π/180 · 3958.7613 = 69.086…

  /** Filter conditions ONLY: `And(box, exact)` and the marker agree
    * under WHERE (null ≡ row dropped) but differ as a VALUE — with
    * lat outside the box and lon null the marker is null while the
    * rewritten form is false. A projected/CASE'd st_dwithin therefore
    * keeps the marker's exact 3-valued eval. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val rewritten = rewriteCondition(f.condition)
      if (rewritten fastEquals f.condition) f else f.copy(condition = rewritten)
  }

  /** Descends ONLY through And/Or legs: under WHERE, null ≡ false
    * propagates through conjunction/disjunction (Kleene: a null leg
    * can never turn a kept row into a dropped one or vice versa when
    * the marker is replaced by a false-on-null form). It does NOT
    * descend into Not / coalesce / CASE / comparison operands, where
    * null and false are observable as different VALUES — e.g.
    * `NOT st_dwithin(lat, NULL, …)` is null (row dropped) while
    * `NOT And(box, exact)` would be true (row kept). */
  private def rewriteCondition(cond: Expression): Expression = cond match {
    case And(l, r) => And(rewriteCondition(l), rewriteCondition(r))
    case Or(l, r) => Or(rewriteCondition(l), rewriteCondition(r))
    case sd @ StDWithin(lat, lon,
        Literal(clat: Double, DoubleType),
        Literal(clon: Double, DoubleType),
        Literal(r: Double, DoubleType))
        if lat.dataType == DoubleType && lon.dataType == DoubleType &&
          boxable(clat, clon, r) =>
      val dLat = r / MilesPerDegree
      val farLat = math.min(math.abs(clat) + dLat, 89.999)
      val dLon = r / (MilesPerDegree * math.cos(math.toRadians(farLat)))
      val box = And(
        And(GreaterThanOrEqual(lat, Literal(clat - dLat)),
          LessThanOrEqual(lat, Literal(clat + dLat))),
        And(GreaterThanOrEqual(lon, Literal(clon - dLon)),
          LessThanOrEqual(lon, Literal(clon + dLon))))
      And(box, exact(sd))
    case other => other
  }

  /** Conservative applicability: positive radius, box inside one pole
    * and one antimeridian period. */
  private def boxable(clat: Double, clon: Double, r: Double): Boolean = {
    if (!(r > 0) || r.isNaN || clat.isNaN || clon.isNaN) return false
    val dLat = r / MilesPerDegree
    if (math.abs(clat) + dLat >= 89.0) return false
    val farLat = math.abs(clat) + dLat
    val dLon = r / (MilesPerDegree * math.cos(math.toRadians(farLat)))
    math.abs(clon) + dLon < 179.999
  }

  /** The exact residual: the same built-in composition
    * BqFunctions.haversineMiles builds, as resolved expressions —
    * fully codegen'd, bit-identical to StDWithin.eval. */
  private def exact(sd: StDWithin): Expression = {
    import sd.{lat1, lon1, lat2, lon2, radiusMiles}
    def lit(d: Double) = Literal(d)
    val dLat = Divide(ToRadians(Subtract(lat2, lat1)), lit(2.0))
    val dLon = Divide(ToRadians(Subtract(lon2, lon1)), lit(2.0))
    val a = Add(
      Pow(Sin(dLat), lit(2.0)),
      Multiply(Multiply(Cos(ToRadians(lat1)), Cos(ToRadians(lat2))),
        Pow(Sin(dLon), lit(2.0))))
    val dist = Multiply(Multiply(lit(StDWithin.EarthRadiusMiles), lit(2.0)),
      Asin(Sqrt(a)))
    LessThanOrEqual(dist, radiusMiles)
  }
}
