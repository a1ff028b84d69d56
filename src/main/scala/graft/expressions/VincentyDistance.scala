package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** WGS84 spheroid geodesic distance (Vincenty inverse formula,
  * meters) — the spheroid-exact counterpart to the haversine
  * `st_distance` (BqFunctions), closing SURVEY §2.9's ≤0.5%
  * sphere-vs-spheroid divergence: BigQuery's ST_DISTANCE is
  * spheroid-based, so a user comparing the reference's 10-mile
  * threshold (locations_clean.sql:63) against live BigQuery near the
  * boundary needs this variant (ref locations_clean.sql:48).
  *
  * Determinism contract (what makes it oracle-checkable): the λ
  * fixed-point runs EXACTLY [[VincentyDistance.Iters]] iterations with
  * no convergence early-exit, degree→radian conversion multiplies by
  * the injected [[VincentyDistance.Rad]] literal (Java's
  * `Math.toRadians` divides by 180 first — a different double than
  * SQL `radians()`), and squares are written `x*x`, never `pow(x,2)`.
  * The DuckDB replay ([[graft.queries.OperatorOracles]]
  * vincentyMilesSql) is GENERATED from the same constants with the
  * same operation order, so both engines walk bit-near-identical
  * iteration sequences (residual divergence = libm trig ULPs, orders
  * of magnitude under the 4dp output rounding).
  *
  * Scale shape: a pure scalar inside whole-stage codegen (static call,
  * no allocation) — scan-speed at 100 TB like the haversine it sits
  * beside. Coincident points short-circuit to 0 (sinσ = 0 guard, same
  * CASE in the replay). Fixed iterations also mean the nearly
  * antipodal non-convergence mode of classic Vincenty cannot loop or
  * diverge between engines — both emit the same 6th iterate.
  */
case class VincentyDistance(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression) extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    VincentyDistance.meters(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.expressions.VincentyDistance.meters($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): VincentyDistance =
    copy(lat1 = f, lon1 = s, lat2 = t, lon2 = q)

  override def prettyName: String = "st_distance_spheroid"
}

object VincentyDistance {
  /** WGS84 semi-major / semi-minor axes and flattening. */
  val SemiMajorA = 6378137.0
  val SemiMinorB = 6356752.314245
  val InverseFlattening = 298.257223563
  /** Degree→radian factor injected into BOTH engines (never the
    * built-in radians()/toRadians, whose operation orders differ). */
  val Rad = 0.017453292519943295
  /** Fixed λ iteration count (no early exit — determinism contract). */
  val Iters = 6

  /** Geodesic meters between two WGS84 (lat, lon) degree pairs.
    * Called from generated code. */
  def meters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val a = SemiMajorA; val b = SemiMinorB
    val f = 1.0 / InverseFlattening
    val bigL = (lon2 - lon1) * Rad
    val u1 = math.atan((1.0 - f) * math.tan(lat1 * Rad))
    val u2 = math.atan((1.0 - f) * math.tan(lat2 * Rad))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)
    var lambda = bigL
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cos2Alpha = 0.0; var cos2Sm = 0.0
    var it = 0
    while (it < Iters) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      val t1 = cosU2 * sinL
      val t2 = cosU1 * sinU2 - sinU1 * cosU2 * cosL
      sinSigma = math.sqrt(t1 * t1 + t2 * t2)
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = if (sinSigma == 0.0) 0.0 else cosU1 * cosU2 * sinL / sinSigma
      cos2Alpha = 1.0 - sinAlpha * sinAlpha
      cos2Sm = if (cos2Alpha == 0.0) 0.0
        else cosSigma - 2.0 * sinU1 * sinU2 / cos2Alpha
      val cc = f / 16.0 * cos2Alpha * (4.0 + f * (4.0 - 3.0 * cos2Alpha))
      lambda = bigL + (1.0 - cc) * f * sinAlpha *
        (sigma + cc * sinSigma * (cos2Sm + cc * cosSigma * (-1.0 + 2.0 * cos2Sm * cos2Sm)))
      it += 1
    }
    if (sinSigma == 0.0) return 0.0
    val uu = cos2Alpha * (a * a - b * b) / (b * b)
    val bigA = 1.0 + uu / 16384.0 * (4096.0 + uu * (-768.0 + uu * (320.0 - 175.0 * uu)))
    val bigB = uu / 1024.0 * (256.0 + uu * (-128.0 + uu * (74.0 - 47.0 * uu)))
    val dSigma = bigB * sinSigma * (cos2Sm + bigB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2Sm * cos2Sm) - bigB / 6.0 * cos2Sm *
        (-3.0 + 4.0 * sinSigma * sinSigma) * (-3.0 + 4.0 * cos2Sm * cos2Sm)))
    b * bigA * (sigma - dSigma)
  }

  /** Column-API entry point: spheroid meters from degree columns. */
  def stDistanceSpheroid(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column =
    ColumnBridge.column(VincentyDistance(
      ColumnBridge.expression(lat1), ColumnBridge.expression(lon1),
      ColumnBridge.expression(lat2), ColumnBridge.expression(lon2)))
}
