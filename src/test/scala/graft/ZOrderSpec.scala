package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder
import graft.sources.Tables

/** Z-order layout: bit-dilation correctness plus the actual layout
  * claim — z-sorted files have tight bounding boxes in BOTH
  * dimensions, which is what makes 2-d min/max pruning work at
  * scale. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("zValue interleaves bits (hand-computed cases)") {
    // morton(x=0b11, y=0b01) = y1 x1 y0 x0 = 0b0111; morton is
    // monotone along each axis when the other is fixed
    val rows = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L), (5L, 6L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    def morton(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      z
    }
    assert(rows(0) === morton(3, 1) && rows(0) === 0x7L)
    assert(rows(1) === 0L)
    assert(rows(2) === 0x55555555L) // all even bits
    assert(rows(3) === 0xAAAAAAAAL) // all odd bits
    assert(rows(4) === morton(5, 6))
  }

  test("quantize16 clamps and grids") {
    val q = Seq(0.0, 50.0, 100.0, -5.0, 105.0).toDF("v")
      .select(ZOrder.quantize16(col("v"), 0.0, 100.0).as("q"))
      .collect().map(_.getLong(0))
    assert(q(0) === 0L && q(1) === 32768L && q(2) === 65535L)
    assert(q(3) === 0L && q(4) === 65535L) // out-of-range clamps
  }

  test("z-ordered layout bounds BOTH dims per file; 1-d sort does not") {
    // quantize both dims onto the shared 16-bit grid first — with raw
    // unequal domains the wider dim's high bits would dominate the
    // interleave (why writeZOrdered pairs with quantize16)
    val raw = Tables(spark, "/root/testdata/sf0.01").lineitem
      .select(col("l_partkey").cast("double").as("xr"),
        col("l_orderkey").cast("double").as("yr"))
    val b = raw.agg(min("xr"), max("xr"), min("yr"), max("yr")).head()
    val src = raw.select(
      ZOrder.quantize16(col("xr"), b.getDouble(0), b.getDouble(1)).as("x"),
      ZOrder.quantize16(col("yr"), b.getDouble(2), b.getDouble(3)).as("y"))
    val files = 16
    val zDir = tmp("graft-zorder")
    ZOrder.writeZOrdered(src, "x", "y", zDir, files)
    val xDir = tmp("graft-xorder")
    src.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    // mean fraction of each dimension's OBSERVED domain covered per
    // output file (what parquet min/max footer pruning sees)
    def domain(c: String): Double = {
      val mm = src.agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
      (mm.getLong(1) - mm.getLong(0)).toDouble
    }
    val xDom = domain("x"); val yDom = domain("y")
    def meanSpan(dir: String, c: String, dom: Double): Double = {
      val spans = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map { f =>
          val mm = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
          (mm.getLong(1) - mm.getLong(0)).toDouble / dom
        }
      spans.sum / spans.length
    }
    val zx = meanSpan(zDir, "x", xDom); val zy = meanSpan(zDir, "y", yDom)
    val sx = meanSpan(xDir, "x", xDom); val sy = meanSpan(xDir, "y", yDom)
    // 1-d sort: x spans collapse but y spans the whole domain
    assert(sx < 0.2, s"x-sorted layout should bound x (got $sx)")
    assert(sy > 0.8, s"x-sorted layout can't bound y (got $sy)")
    // z-order: BOTH dims bounded — that (not a smaller area product)
    // is the layout's claim: min/max pruning works for predicates on
    // EITHER dimension, where a 1-d sort only serves its own column
    assert(zx < 0.6 && zy < 0.6,
      s"z-ordered layout should bound both dims (x=$zx y=$zy)")

    // simulate footer pruning for a 1/8-of-domain range predicate on
    // each dim: count files whose [min,max] intersects the range
    def filesHit(dir: String, c: String, lo: Long, hi: Long): Int =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .count { f =>
          val mm = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
          mm.getLong(0) <= hi && mm.getLong(1) >= lo
        }
    // a 1/8-wide window that stays inside one top-level quadrant
    // ([32768, 49152)): a window straddling a high z-bit boundary
    // legitimately touches both adjacent quadrants' files
    val (lo, hi) = (34000L, 42000L)
    val yHitsX = filesHit(xDir, "y", lo, hi)
    val yHitsZ = filesHit(zDir, "y", lo, hi)
    val xHitsZ = filesHit(zDir, "x", lo, hi)
    assert(yHitsX === files,
      s"x-sorted layout unexpectedly pruned a y predicate ($yHitsX/$files)")
    // 16 quantile-cut files ≈ 2 distinguishable bits per dim: a 1/8
    // window overlaps ~2 quarter-spans plus boundary files, so the
    // bound is ~10, not files/2 — the claim is pruning EXISTS on both
    // dims, vs none at all for the off-sort dim of a 1-d layout
    assert(yHitsZ <= 10,
      s"z-order should prune y predicates ($yHitsZ/$files files hit)")
    assert(xHitsZ <= 10,
      s"z-order should still prune x predicates ($xHitsZ/$files files hit)")
  }
}
