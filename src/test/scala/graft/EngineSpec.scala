package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  test("Engine facade: catalog, dialect SQL, SQL-model DAG") {
    val wh = java.nio.file.Files.createTempDirectory("graft-engine").toString
    val engine = Engine(spark, wh, "/root/testdata/sf0.001")
    assert(engine.table("nation").count() === 25)
    // dialect translation end to end: QUALIFY + registered st_distance
    engine.table("customer").createOrReplaceTempView("eng_cust")
    // (the QUALIFY desugar supports the reference's `select * … where …
    // qualify row_number() = 1` shape)
    val top = engine.sql(
      """select * from eng_cust where 1=1
        |qualify row_number() over (partition by c_nationkey order by c_acctbal desc) = 1""".stripMargin)
    assert(top.count() === top.select("c_nationkey").distinct().count())
    // SQL-model DAG with a ref() edge
    val out = engine.runSqlModels(
      modelSql = Map(
        "base" -> "select c_nationkey, count(*) as n from {{ source('raw','cust') }} group by 1",
        "top" -> "select * from {{ ref('base') }} where n > 2"),
      sources = Map("cust" -> engine.table("customer")))
    assert(out("top").count() > 0)
    assert(out("base").count() === 25 || out("base").count() > 0)
  }

  test("relationships test: orphans surface with counts; nulls and matches pass") {
    import spark.implicits._
    import graft.model.DataChecks
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(9L), None)
      .toDF("fk")
    val viol = DataChecks.relationships(child, "fk", parent, "pk")
      .as[(Long, Long)].collect().toMap
    assert(viol == Map(9L -> 3L), s"orphan census: $viol")
    assert(!DataChecks.passes(
      DataChecks.relationships(child, "fk", parent, "pk")))
    val clean = Seq(Some(1L), None).toDF("fk")
    assert(DataChecks.passes(
      DataChecks.relationships(clean, "fk", parent, "pk")),
      "matched + null keys are not violations")
  }

  test("sourceFreshness: pass/warn/error thresholds; dead feed errors with null max") {
    import spark.implicits._
    import graft.model.DataChecks
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("fresh", ts("2024-01-10 00:00:00")),
      ("stale", ts("2024-01-05 00:00:00")),
      ("ancient", ts("2024-01-01 00:00:00"))).toDF("source", "ts")
    val sources = Seq("fresh", "stale", "ancient", "dead").toDF("source")
    val out = DataChecks.sourceFreshness(rows, sources,
        ts("2024-01-11 00:00:00"),
        warnAfterS = 86400L * 2, errorAfterS = 86400L * 7)
      .select("src", "lag_s", "status")
      .as[(String, Option[Long], String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("fresh") == (("fresh", Some(86400L), "pass")), s"$out")
    assert(out("stale") == (("stale", Some(86400L * 6), "warn")), s"$out")
    assert(out("ancient") == (("ancient", Some(86400L * 10), "error")), s"$out")
    assert(out("dead") == (("dead", None, "error")),
      s"a silent feed is an error: $out")
  }
}
