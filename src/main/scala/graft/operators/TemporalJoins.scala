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
    * with `rightTs <= leftTs` within `toleranceSeconds` (timestamp
    * columns). Left rows with no candidate survive with nulls
    * (left-outer semantics). Ties on rightTs break on the smallest
    * `rightTieBreak`.
    *
    * Top-1-per-left is computed with min_by over (inverted-µs ts,
    * tie-break) rather than a row_number window: min_by partially
    * aggregates MAP-SIDE, so only one row per left row crosses the
    * shuffle — the window formulation sorts the full
    * |L| × candidates-per-row intermediate through an exchange, which
    * is the term that explodes with right-side density at scale. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      toleranceSeconds: Long, rightTieBreak: String): DataFrame = {
    val leftKeyed = left.withColumn("__lid", monotonically_increasing_id())
    val cond = col(rightTs) <= col(leftTs) &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $toleranceSeconds SECONDS")
    // Latest rightTs = min of (Long.MaxValue - µs); ties = min tie-break.
    // A left row with no candidate forms a single all-null group, so
    // min_by can only ever return its null payload (left-outer nulls).
    val ord = struct(
      lit(Long.MaxValue) - unix_micros(col(rightTs)), col(rightTieBreak))
    val payload = struct(right.columns.toIndexedSeq.map(col): _*)
    val leftAggs = left.columns.toIndexedSeq.map(c => first(col(c)).as(c))
    val aggs = leftAggs :+ min_by(payload, ord).as("__best")
    leftKeyed.join(right, cond, "left")
      .groupBy(col("__lid"))
      .agg(aggs.head, aggs.tail: _*)
      .select(left.columns.toIndexedSeq.map(col) ++
        right.columns.toIndexedSeq.map(c => col(s"__best.$c").as(c)): _*)
  }

  /** Range (interval-containment) join: left rows matched to every
    * right interval with `start <= ts < end`. Caller bounds interval
    * width; with disjoint intervals this is the standard
    * event-to-window assignment. Theta-join form — right when the
    * interval side broadcasts; for a large interval side use
    * [[rangeJoinBucketed]]. */
  def rangeJoin(left: DataFrame, right: DataFrame,
      ts: String, start: String, end: String): DataFrame =
    left.join(right, col(ts) >= col(start) && col(ts) < col(end), "inner")

  /** Range join for a LARGE interval side: both sides key onto a
    * coarse time grid — each interval explodes to the cells it covers
    * (≤ width/bucket + 1 rows), each event to its single cell — and
    * the match becomes a hash-partitioned EQUI-join on the cell plus
    * an exact residual filter. No broadcast, no nested-loop: this is
    * the shape that joins 100 TB of events to millions of intervals.
    * Each (event, interval) pair meets in exactly one cell (the
    * event's), so no dedup is needed. Pick `bucketUs` near the median
    * interval width: larger buckets mean fewer interval replicas,
    * smaller buckets a tighter candidate set. */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame,
      ts: String, start: String, end: String,
      bucketUs: Long): DataFrame = {
    val cells = right
      .filter(col(end) > col(start))
      .withColumn("__cell", explode(sequence(
        floor(unix_micros(col(start)) / bucketUs),
        floor((unix_micros(col(end)) - 1) / bucketUs))))
    val keyed = left.withColumn("__cell", floor(unix_micros(col(ts)) / bucketUs))
    keyed.join(cells, Seq("__cell"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__cell")
  }
}
