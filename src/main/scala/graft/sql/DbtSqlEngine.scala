package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Materialization, Model, ModelGraph, Runner}

/** Runs a dbt-style project of BigQuery-dialect SQL models on Spark:
  * Jinja source()/ref() calls define the DAG (SURVEY §2.11/§3), each
  * model's SQL is translated by [[BigQueryDialect]] and executed via
  * spark.sql in topological order with the same Runner/materialization
  * machinery as the DataFrame models. This is the "switch without
  * rewriting your queries" path for a user of the reference.
  */
final class DbtSqlEngine(spark: SparkSession, warehouseDir: String,
    currentDateOverride: Option[String] = None, threads: Int = 4,
    vars: Map[String, String] = Map.empty,
    envVars: Map[String, String] = sys.env,
    macros: Map[String, Jinja.MacroDef] = Map.empty) {

  /** @param modelSql   model name -> raw (Jinja + BigQuery) SQL
    * @param sources    source table name -> DataFrame
    * @param materializations model name -> View/Table (default View);
    *        an in-model `{{ config(materialized=...) }}` beats this,
    *        exactly dbt's precedence (model config > dbt_project.yml)
    */
  def run(modelSql: Map[String, String], sources: Map[String, DataFrame],
      materializations: Map[String, Materialization] = Map.empty): Map[String, DataFrame] = {
    sources.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val models = modelSql.map { case (name, sql) =>
      // render Jinja FIRST: a ref() inside a false {% if %} branch
      // must not become a DAG edge (the branch never executes)
      val r = BigQueryDialect.renderJinjaWithConfig(sql, vars, envVars, macros)
      val translated = BigQueryDialect.translate(r.text, currentDateOverride)
      val mat = r.config.get("materialized") match {
        case Some("table") => Materialization.Table
        case Some("view") => Materialization.View
        case Some(other) => throw new IllegalArgumentException(
          s"model $name: unsupported config(materialized='$other')")
        case None => materializations.getOrElse(name, Materialization.View)
      }
      Model(name, BigQueryDialect.refs(r.text), mat)(_ => spark.sql(translated))
    }.toSeq
    ModelGraph.topoSort(models) // fail fast on cycles before any work
    new Runner(spark, sources, warehouseDir, threads).run(models)
  }
}
