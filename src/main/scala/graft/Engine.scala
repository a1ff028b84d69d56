package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Materialization, Model, Runner}
import graft.sources.Tables
import graft.sql.{BigQueryDialect, DbtSqlEngine, GraftFunctions}

/** Facade over the engine: one object a reference user instantiates to
  * get the whole surface — source catalog, BigQuery-dialect SQL,
  * dbt-style model DAGs, and the registered SQL functions.
  *
  * {{{
  * val engine = Engine(spark, "/data/warehouse", "/data/sources")
  * engine.table("lineitem")                     // catalog
  * engine.sql("SELECT * FROM t QUALIFY row_number() OVER (...) = 1")
  * engine.runSqlModels(Map("mart" -> bqSql), sources)   // dbt project
  * engine.build(models, sources)                // run + data tests
  * }}}
  */
final class Engine(val spark: SparkSession, warehouseDir: String,
    sourceDir: Option[String] = None, threads: Int = 4) {

  GraftFunctions.register(spark)

  lazy val tables: Option[Tables] = sourceDir.map(Tables(spark, _))

  def table(name: String): DataFrame = tables match {
    case Some(t) => t.table(name)
    case None => spark.table(name)
  }

  /** Execute one BigQuery-dialect statement (QUALIFY, SAFE.PARSE_DATE,
    * DATE_DIFF, r'' strings, ST_* are translated; everything else is
    * Spark SQL). */
  def sql(bigQuerySql: String, currentDateOverride: Option[String] = None): DataFrame =
    spark.sql(BigQueryDialect.translate(bigQuerySql, currentDateOverride))

  /** Run a dbt-style project of raw Jinja+BigQuery SQL models. */
  def runSqlModels(modelSql: Map[String, String], sources: Map[String, DataFrame],
      materializations: Map[String, Materialization] = Map.empty,
      currentDateOverride: Option[String] = None): Map[String, DataFrame] =
    new DbtSqlEngine(spark, warehouseDir, currentDateOverride, threads)
      .run(modelSql, sources, materializations)

  /** Run DataFrame models in DAG order (dbt run). */
  def run(models: Seq[Model], sources: Map[String, DataFrame]): Map[String, DataFrame] =
    new Runner(spark, sources, warehouseDir, threads).run(models)

  /** Run + execute each model's data checks before dependents (dbt build). */
  def build(models: Seq[Model], sources: Map[String, DataFrame]): Map[String, DataFrame] =
    new Runner(spark, sources, warehouseDir, threads).build(models)
}

object Engine {
  def apply(spark: SparkSession, warehouseDir: String,
      sourceDir: String = null, threads: Int = 4): Engine =
    new Engine(spark, warehouseDir, Option(sourceDir), threads)
}
