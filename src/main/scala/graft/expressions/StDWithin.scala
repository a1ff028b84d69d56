package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** `st_dwithin(lat1, lon1, lat2, lon2, radius_miles)` — true when the
  * haversine distance between the two points is ≤ the radius.
  *
  * This expression is deliberately a MARKER, not a fast path: its
  * semantics are exactly `haversineMiles(...) <= radius` (same
  * operation order, same JDK math, bit-identical), and evaluation
  * falls back to that interpreted form. The point of keeping the
  * predicate as one recognizable node is the optimizer rule
  * [[graft.plans.RewriteStDWithin]], which expands it into a
  * CONSERVATIVE literal bounding box (pushed down to the parquet
  * footer / row-group stats) AND the exact codegen'd residual — the
  * classic geo-index rewrite, done with pure Catalyst. Without the
  * rule the query is still correct, just unindexed — the degradation
  * mode a library predicate should have.
  */
case class StDWithin(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression, radiusMiles: Expression)
  extends Expression with ImplicitCastInputTypes with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(lat1, lon1, lat2, lon2, radiusMiles)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  /** Analyzer-inserted casts: plain SQL fractional literals parse as
    * DECIMAL (which is NOT a java.lang.Number subclass internally) and
    * ints as INT — declaring DoubleType inputs makes every surface
    * (SQL text, Column API, shim) reach eval with doubles, and makes
    * [[graft.plans.RewriteStDWithin]]'s DoubleType-literal pattern
    * match after constant folding collapses the casts. */
  // return type inferred — AbstractDataType is private[sql]
  override def inputTypes = Seq.fill(5)(DoubleType)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      // post-analysis children are DoubleType (inputTypes above)
      val Seq(a1, o1, a2, o2, r) = vs.map(_.asInstanceOf[Double])
      StDWithin.haversineMiles(a1, o1, a2, o2) <= r
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): StDWithin =
    copy(c(0), c(1), c(2), c(3), c(4))
}

object StDWithin {
  /** Earth radius used across the library (BqFunctions.haversineMiles). */
  val EarthRadiusMiles = 3958.7613

  /** Same operation order as the built-in composition
    * `lit(R)*2*asin(sqrt(a))` — bit-identical results. */
  def haversineMiles(lat1: Double, lon1: Double,
      lat2: Double, lon2: Double): Double = {
    val dLat = Math.toRadians(lat2 - lat1) / 2
    val dLon = Math.toRadians(lon2 - lon1) / 2
    val a = Math.pow(Math.sin(dLat), 2) +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) *
        Math.pow(Math.sin(dLon), 2)
    EarthRadiusMiles * 2 * Math.asin(Math.sqrt(a))
  }

  /** Column-API entry point. */
  def stDWithin(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
      radiusMiles: Column): Column =
    ColumnBridge.column(StDWithin(
      ColumnBridge.expression(lat1), ColumnBridge.expression(lon1),
      ColumnBridge.expression(lat2), ColumnBridge.expression(lon2),
      ColumnBridge.expression(radiusMiles)))
}
