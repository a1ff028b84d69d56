package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as primitives — built per the
  * extension preference order tier (a): composed from existing
  * operators, which keeps them inside Catalyst's planning (AQE,
  * codegen, pushdown) with zero custom physical code.
  *
  * Scale design: the naive as-of formulation (join on `r.ts <= l.ts`
  * then take the max) is an unbounded range join — O(|L|·|R|) pairs.
  * The composition here bounds the lookback with a tolerance, so the
  * intermediate is |L| × (candidates within tolerance); with a
  * broadcast-able right side it is a map-side nested-loop over a tiny
  * sorted table, and with a large right side both sides can be
  * bucketed on a shared coarse time grid. DuckDB's native ASOF JOIN is
  * the oracle for correctness.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single most recent right row
    * with `rightTs <= leftTs` within `toleranceSeconds`. Left rows
    * with no candidate survive with nulls (left-outer semantics).
    * Ties on rightTs break on the smallest `rightTieBreak`. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      toleranceSeconds: Long, rightTieBreak: String): DataFrame = {
    val leftKeyed = left.withColumn("__lid", monotonically_increasing_id())
    val cond = col(rightTs) <= col(leftTs) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $toleranceSeconds SECONDS")
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col(rightTs).desc_nulls_last, col(rightTieBreak).asc_nulls_last)
    leftKeyed.join(right, cond, "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__lid")
  }

  /** Range (interval-containment) join: left rows matched to every
    * right interval with `start <= ts < end`. Caller bounds interval
    * width; with disjoint intervals this is the standard
    * event-to-window assignment. */
  def rangeJoin(left: DataFrame, right: DataFrame,
      ts: String, start: String, end: String): DataFrame =
    left.join(right, col(ts) >= col(start) && col(ts) < col(end), "inner")
}
