package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsofJoin

/** The native as-of operator must agree with (a) hand-computed
  * expectations, (b) the tier-(a) composed implementation on real
  * data, and (c) show the single-merge plan shape (no window, no
  * per-row fan-out).
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of: hand-built keyed case incl. tolerance and misses") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:01:00"), 101.0),
      (2L, ts("2024-01-01 09:00:00"), 200.0), // before any quote
      (3L, ts("2024-01-01 10:00:30"), 300.0)  // key with no quotes
    ).toDF("sym", "t_ts", "price")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.5),
      (1L, ts("2024-01-01 10:00:50"), 100.5),
      (2L, ts("2024-01-01 09:30:00"), 199.0)
    ).toDF("sym", "q_ts", "quote")

    val out = AsofJoin.asofJoin(trades, quotes.withColumnRenamed("sym", "qsym"),
        Seq("sym"), Seq("qsym"), "t_ts", "q_ts")
      .select($"sym", $"t_ts", $"quote").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
      .toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:05.0", 99.5),
      (1L, "2024-01-01 10:01:00.0", 100.5),
      (2L, "2024-01-01 09:00:00.0", -1.0),  // quote is later -> no match
      (3L, "2024-01-01 10:00:30.0", -1.0))) // no quotes for key

    // tolerance: 10s window drops the 65s-stale quote for trade 2
    val tight = AsofJoin.asofJoin(trades, quotes.withColumnRenamed("sym", "qsym"),
        Seq("sym"), Seq("qsym"), "t_ts", "q_ts", toleranceUs = 10L * 1000000)
      .filter($"sym" === 1 && $"t_ts" === ts("2024-01-01 10:01:00"))
      .select($"quote").collect()
    assert(tight.head.getDouble(0) == 100.5) // 10s-old quote still in window
  }

  test("native as-of ≡ composed as-of on events data") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("l_ts"), $"event_id".as("l_id"))
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("r_user"), $"ts".as("r_ts"), $"event_id".as("r_id"))
    val native = AsofJoin.asofJoin(views, clicks,
        Seq("user_id"), Seq("r_user"), "l_ts", "r_ts",
        toleranceUs = 86400L * 1000000)
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    // composed: range join + top-1 (keyed via equality in the condition)
    val composed = {
      import org.apache.spark.sql.expressions.Window
      val cond = $"user_id" === $"r_user" && $"r_ts" <= $"l_ts" &&
        $"r_ts" >= $"l_ts" - expr("INTERVAL 86400 SECONDS")
      val w = Window.partitionBy($"l_id").orderBy($"r_ts".desc, $"r_id".desc)
      views.join(clicks, cond, "left")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    }
    // clicks per user have unique ts at this granularity -> comparable
    assert(native.keySet == composed.keySet)
    val diffs = native.filter { case (k, v) => composed(k) != v }
    assert(diffs.isEmpty, s"native vs composed mismatches: ${diffs.take(5)}")
  }

  test("native as-of plan has no Window and no range-join fan-out") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").events
    val l = e.select($"user_id", $"ts".as("l_ts"), $"event_id".as("l_id"))
    val r = e.select($"user_id".as("r_user"), $"ts".as("r_ts"))
    val plan = AsofJoin.asofJoin(l, r, Seq("user_id"), Seq("r_user"),
      "l_ts", "r_ts").queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), "native operator must not plan a window")
  }

  test("PIT feature assembly is leakage-free and picks the latest eligible row") {
    // every attached feature timestamp is <= the label timestamp, and
    // is the MAX eligible feature ts for that user — checked against a
    // recomputation from the raw stream
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.AnalyticsQueries.qPitFeatures(spark, dir)
      .select("event_id", "user_id", "ts", "ck_ts")
      .collect()
    val clicks = graft.sources.Tables(spark, dir).events
      .filter($"event_type" === "click")
      .select($"user_id", $"ts").as[(Long, java.sql.Timestamp)]
      .collect().groupBy(_._1).map { case (u, v) => u -> v.map(_._2) }
    assert(out.nonEmpty)
    var attached = 0
    out.foreach { r =>
      val (u, ts, ck) = (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))
      val eligible = clicks.getOrElse(u, Array.empty[java.sql.Timestamp])
        .filter(!_.after(ts))
      if (ck != null) {
        attached += 1
        assert(!ck.after(ts), s"leaked future feature: $ck > $ts")
        assert(ck == eligible.max, s"not the latest eligible click for user $u")
      } else assert(eligible.isEmpty, s"missed an eligible click for user $u")
    }
    assert(attached > 0, "no feature rows attached — join never fired")
  }
}
