package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) multi-dimensional layout: interleave the bits of
  * two dimension keys so that sorting by the single z-value clusters
  * BOTH dimensions at once. The point at 100 TB: a table laid out by
  * z-value gives every file/row-group a tight bounding box in both
  * dimensions, so a 2-d range predicate prunes on parquet min/max
  * stats in both columns — where a single-column sort collapses one
  * dimension's spans and leaves the other spanning the whole domain.
  *
  * Everything here is codegen'd integer bit arithmetic on built-in
  * expressions (shiftleft / bitwise AND / OR — no UDF), and is exactly
  * replayable in any engine with 64-bit integer ops, which is what
  * lets a DuckDB oracle hash-check the z-values.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so original bit i lands at bit 2i
    * (the classic magic-number dilation, 4 shift+mask rounds). Input
    * is masked to 16 bits first. */
  def spread16(c: Column): Column = {
    val a = c.cast(LongType).bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit keys: x on even bits, y on odd. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Quantize a double in [min, max] onto the 16-bit grid (clamped —
    * out-of-range values land on the border cell). */
  def quantize16(c: Column, min: Double, max: Double): Column =
    least(greatest(
        floor((c - lit(min)) / lit(max - min) * 65536.0), lit(0.0)),
      lit(65535.0)).cast(LongType)

  /** Write `df` z-ordered on two numeric columns: range-partition +
    * sort by z-value, so each output file owns a contiguous z-range =
    * a tight 2-d bounding box. `files` controls layout granularity
    * (at scale: one file per executor-sized slice). A repartitionRange
    * by z is one extra shuffle at write time; every 2-d range query
    * after it prunes files by footer stats.
    *
    * Both dimensions are quantized HERE onto the 16-bit grid from
    * their observed min/max (one pre-pass aggregate — at 100 TB a
    * column-pruned scan of two columns, or free if the caller's
    * catalog already has stats). Feeding raw keys into [[spread16]]
    * would alias values mod 65536 (e.g. an orderkey of 65537 lands
    * next to 1), silently destroying the per-file bounding-box
    * property this API exists for; quantization is monotone per dim,
    * so already-gridded 0..65535 inputs keep their order. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, files: Int = 16): Unit = {
    val xd = col(xCol).cast(DoubleType)
    val yd = col(yCol).cast(DoubleType)
    val b = df.agg(min(xd), max(xd), min(yd), max(yd)).head()
    if (b.isNullAt(0) || b.isNullAt(2)) {
      // empty input or all-null dims: nothing to order on
      df.write.mode("overwrite").parquet(path)
      return
    }
    def q(c: Column, lo: Double, hi: Double): Column =
      if (hi > lo) quantize16(c, lo, hi) else lit(0L)
    val z = zValue(
      q(xd, b.getDouble(0), b.getDouble(1)),
      q(yd, b.getDouble(2), b.getDouble(3)))
    df.withColumn("zv", z)
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions(col("zv"))
      .drop("zv")
      .write.mode("overwrite").parquet(path)
  }
}
