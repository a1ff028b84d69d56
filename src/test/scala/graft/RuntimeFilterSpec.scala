package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RuntimeFilters
import graft.sources.Tables

/** Catalyst's runtime bloom-filter injection on the selective-dim ⋈
  * fact shape (the no-broadcast scale path). Locally the 10 GB
  * application-side threshold suppresses it, so the spec scopes the
  * threshold down via RuntimeFilters.withRuntimeBloom and pins the
  * plan shape + exactness. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def shape() = {
    val t = Tables(spark, "/root/testdata/sf0.01")
    t.lineitem
      .join(t.part.filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("qty"))
  }

  /** Forbid broadcast so the shuffle-join runtime-filter path runs
    * (with a broadcastable dim Spark broadcasts and needs no bloom —
    * the injection rule itself declines when a broadcast is coming). */
  private def noBroadcast[T](f: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prior = keys.map(k => k -> spark.conf.getOption(k)).toMap
    keys.foreach(spark.conf.set(_, "-1"))
    try f
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bloom filter is injected on the fact side and stays exact") {
    val (plan, withBloom) = noBroadcast(RuntimeFilters.withRuntimeBloom(spark) {
      val df = shape()
      (df.queryExecution.executedPlan.toString, df.collect())
    })
    assert(plan.contains("bloom_filter_agg"),
      s"no bloom build side in plan:\n$plan")
    assert(plan.contains("might_contain"),
      s"no bloom probe on the fact scan:\n$plan")
    val without = shape().collect()
    assert(withBloom.sameElements(without),
      "runtime bloom filter changed the join result")
  }

  test("default session keeps production thresholds (no local injection)") {
    val plan = noBroadcast(shape().queryExecution.executedPlan.toString)
    assert(!plan.contains("bloom_filter_agg"),
      "bloom injected below the production threshold — conf leak from another test?")
  }
}
