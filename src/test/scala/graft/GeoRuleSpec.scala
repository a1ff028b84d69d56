package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.StDWithin
import graft.functions.BqFunctions
import graft.plans.RewriteStDWithin

/** The st_dwithin geo-radius rewrite: marker predicate → literal
  * bounding box (pushed to the parquet scan) + exact codegen'd
  * residual, with identical results rule-on and rule-off. */
class GeoRuleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val had = spark.experimental.extraOptimizations.contains(RewriteStDWithin)
    if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteStDWithin
    try f
    finally if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteStDWithin)
  }

  /** Rule-off baseline: strip ANY pre-existing registration (another
    * suite may share this session), restore after. */
  private def withoutRule[T](f: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == RewriteStDWithin)
    try f finally spark.experimental.extraOptimizations = saved
  }

  private lazy val ptsPath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-geo").toString
    // deterministic point cloud with REAL stored lat/lon columns (so
    // the box comparisons are scan-pushable, unlike computed columns);
    // co-prime multipliers decorrelate the dims (a shared id modulus
    // would collapse the cloud onto a sparse diagonal lattice)
    spark.range(20000).select(col("id"),
        ((col("id") * 37 % 2400) / 20.0 - 60 + 0.025).as("lat"),
        ((col("id") * 101 % 6000) / 20.0 - 150 + 0.025).as("lon"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def radius(latC: Double, lonC: Double, r: Double) =
    spark.read.parquet(ptsPath).filter(StDWithin.stDWithin(
      col("lat"), col("lon"), lit(latC), lit(lonC), lit(r)))

  test("rewrite pushes the bounding box into the parquet scan") {
    // default 100-char metadata truncation cuts the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val (plan, n) = try withRule {
      val df = radius(10.25, 20.5, 500.0)
      (df.queryExecution.executedPlan.toString, df.count())
    } finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(!plan.contains("StDWithin") && !plan.contains("st_dwithin"),
      s"marker predicate not rewritten:\n$plan")
    // box legs reach PushedFilters on both coordinates
    def pushed(c: String): Boolean =
      s"PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\($c".r.findFirstIn(plan).isDefined
    assert(pushed("lat"), s"lat bound not pushed:\n$plan")
    assert(pushed("lon"), s"lon bound not pushed:\n$plan")
    // exact residual survives (ASIN of the haversine formula)
    assert(plan.contains("ASIN"), s"exact residual missing:\n$plan")
    assert(n > 0, "radius query returned no rows")
  }

  test("rule-on and rule-off return identical rows") {
    val on = withRule(radius(10.25, 20.5, 1234.5).collect()).map(_.getLong(0)).sorted
    val off = withoutRule(radius(10.25, 20.5, 1234.5).collect()).map(_.getLong(0)).sorted
    assert(on.sameElements(off), "rewrite changed the result set")
    // and both match the plain built-in haversine filter
    val exact = spark.read.parquet(ptsPath)
      .filter(BqFunctions.haversineMiles(col("lat"), col("lon"),
        lit(10.25), lit(20.5)) <= 1234.5)
      .collect().map(_.getLong(0)).sorted
    assert(on.sameElements(exact), "st_dwithin diverges from haversineMiles")
  }

  test("pole-crossing and antimeridian boxes are left as the exact fallback") {
    withRule {
      for ((la, lo) <- Seq((88.0, 0.0), (0.0, 179.5))) {
        val plan = radius(la, lo, 500.0).queryExecution.executedPlan.toString
        assert(plan.contains("stdwithin") || plan.contains("StDWithin"),
          s"unsafe box ($la,$lo) was rewritten:\n$plan")
      }
    }
  }

  test("SQL-surface st_dwithin: decimal/int literals implicit-cast to double") {
    // plain SQL fractional literals parse as DECIMAL and whole ones as
    // INT — inputTypes on StDWithin must cast them (a raw eval would
    // ClassCastException on Decimal) and, after constant folding, the
    // rewrite rule must still match the folded double literals
    graft.sql.GraftFunctions.register(spark)
    spark.read.parquet(ptsPath).createOrReplaceTempView("geo_pts")
    def sqlCount(pred: String): Long = spark.sql(
      s"SELECT count(*) AS n FROM geo_pts WHERE $pred").head().getLong(0)
    val exact = radius(10.25, 20.5, 3000.0).count()
    assert(sqlCount("st_dwithin(lat, lon, 10.25, 20.5, 3000.0)") === exact,
      "decimal literals diverge from Column-API path")
    assert(sqlCount("st_dwithin(lat, lon, 10.25, 20.5, 3000)") === exact,
      "int radius literal diverges")
    // the rewrite fires on the SQL path too (casts fold to doubles)
    withRule {
      val plan = spark.sql(
        "SELECT * FROM geo_pts WHERE st_dwithin(lat, lon, 10.25, 20.5, 3000.0)")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("StDWithin") && !plan.contains("st_dwithin"),
        s"SQL decimal literals kept the marker unrewritten:\n$plan")
    }
  }

  test("projected st_dwithin keeps 3-valued null semantics (no rewrite)") {
    // as a VALUE (not a WHERE leg) the marker must stay: with lat
    // outside the box and lon NULL the answer is NULL, not false
    import spark.implicits._
    val df = Seq((89.9, Option.empty[Double])).toDF("la", "lo")
      .select(StDWithin.stDWithin(col("la"), col("lo"),
        lit(10.25), lit(20.5), lit(100.0)).as("within"))
    val got = withRule(df.collect())
    assert(got.length === 1 && got(0).isNullAt(0),
      "projected st_dwithin with a null coordinate must be NULL")
  }

  test("negated st_dwithin in a Filter is NOT rewritten (null ≠ false under NOT)") {
    // lat far outside the box, lon NULL: the marker is NULL, NOT(NULL)
    // is NULL → row dropped. A naive rewrite gives NOT(false) = true →
    // row kept. Rule-on must match rule-off exactly.
    val df = Seq((89.9, Option.empty[Double]), (10.26, Some(20.5)))
      .toDF("la", "lo")
    def survivors(): Seq[Double] = df.filter(!StDWithin.stDWithin(
        col("la"), col("lo"), lit(10.25), lit(20.5), lit(100.0)))
      .select("la").as[Double].collect().toSeq.sorted
    val on = withRule(survivors())
    val off = withoutRule(survivors())
    assert(on == off, s"NOT-position rewrite changed results: $on vs $off")
    assert(on.isEmpty, "null-coord row drops under NOT; near row is within")
  }

  test("the box is conservative: every circle member is inside it") {
    // 3000-mile radius at mid latitude — box must be a superset
    val inCircle = withoutRule(radius(45.25, 10.5, 3000.0).count())
    val boxed = withRule(radius(45.25, 10.5, 3000.0).collect()).length
    assert(inCircle === boxed.toLong)
  }
}
