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
    macros: Map[String, Jinja.MacroDef] = Map.empty,
    targetProps: Map[String, String] = Map.empty) {

  /** @param modelSql   model name -> raw (Jinja + BigQuery) SQL
    * @param sources    source table name -> DataFrame
    * @param materializations model name -> materialization (default
    *        View); an in-model `{{ config(materialized=...) }}` beats
    *        this, exactly dbt's precedence (model config >
    *        dbt_project.yml)
    *
    * Incremental models get dbt's two-phase semantics: a first render
    * with `is_incremental()` = false decides the materialization (and
    * the full-build SQL); when the target table already exists on
    * disk, the model re-renders with `is_incremental()` = true and
    * `{{ this }}` bound to a temp view over the CURRENT target, so
    * `where ts > (select max(ts) from {{ this }})` reads the resident
    * table — then the Runner folds the filtered output in (merge on
    * `unique_key`, else append).
    */
  def run(modelSql: Map[String, String], sources: Map[String, DataFrame],
      materializations: Map[String, Materialization] = Map.empty,
      tags: Map[String, Set[String]] = Map.empty,
      select: Option[String] = None,
      fullRefresh: Boolean = false,
      exclude: Option[String] = None): Map[String, DataFrame] = {
    val chosen = prepare(modelSql, sources, materializations, tags,
      select, fullRefresh, exclude)
    val out = new Runner(spark, sources, warehouseDir, threads).run(chosen)
    // only the models actually built this run advance in the manifest:
    // a select/exclude-restricted run must NOT record excluded models'
    // new hashes as current, or a later --select state:modified would
    // silently treat them as unmodified and never rebuild them
    writeManifest(modelSql, chosen.map(_.name).toSet)
    out
  }

  /** `dbt build`: like [[run]], but each model's declared data tests
    * execute immediately after it materializes and gate its
    * dependents — a failing test SKIPS everything downstream while
    * independent branches keep running (dbt's skip semantics, not an
    * abort). Tests whose model is not in `modelSql` (seeds, sources)
    * are ignored here — the caller runs those against its own frames.
    * @return (frames for every model that materialized, status per
    *         model: success | fail: … | skipped: …) */
  def build(modelSql: Map[String, String], sources: Map[String, DataFrame],
      materializations: Map[String, Materialization] = Map.empty,
      tags: Map[String, Set[String]] = Map.empty,
      select: Option[String] = None,
      fullRefresh: Boolean = false,
      tests: Seq[DbtTests.DataTest] = Seq.empty,
      exclude: Option[String] = None)
      : (Map[String, DataFrame], Map[String, String]) = {
    val chosen = prepare(modelSql, sources, materializations, tags,
      select, fullRefresh, exclude)
    val byModel = tests.groupBy(_.model)
    val withChecks = chosen.map { m =>
      val checks = byModel.getOrElse(m.name, Seq.empty).map { t =>
        val label = t.column.map(c => s"${t.kind}($c)").getOrElse(t.kind)
        label -> ((df: org.apache.spark.sql.DataFrame) =>
          DbtTests.violatingRows(t, df, spark))
      }
      m.copy(checks = checks)(m.transform)
    }
    val out = new Runner(spark, sources, warehouseDir, threads)
      .buildGated(withChecks)
    // only SUCCESSFUL models advance: a model that failed its gated
    // tests (or was skipped) keeps its old manifest hash, so the next
    // state:modified run still sees it as modified and rebuilds it
    writeManifest(modelSql, out._2.collect {
      case (n, st) if st == "success" => n }.toSet)
    out
  }

  /** dbt `state:modified` support: the warehouse carries a manifest
    * of raw-model-text hashes from the LAST run; the selector
    * resolves against the diff. Raw text (pre-Jinja) is what hashes —
    * a var-only change that alters rendering is NOT detected, which
    * matches hashing-the-source semantics and is documented here
    * deliberately (dbt's own state:modified has the same
    * file-content basis). No manifest on disk ⇒ every model counts
    * modified (first CI run builds the world). */
  private def manifestPath =
    new org.apache.hadoop.fs.Path(s"$warehouseDir/manifest.json")

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def readManifest(): Map[String, String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifestPath)) return Map.empty
    val in = fs.open(manifestPath)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"([\w.]+)"\s*:\s*"([0-9a-f]+)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  /** Merge the hashes of the models ACTUALLY (and successfully) built
    * this run into the previous manifest — never record a hash for a
    * model that was excluded from the run or failed its gated tests
    * (its old hash stays, so state:modified keeps selecting it). */
  private def writeManifest(modelSql: Map[String, String],
      built: Set[String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val merged = readManifest() ++ modelSql.collect {
      case (n, s) if built(n) => n -> sha(s) }
    val json = merged.toSeq.sortBy(_._1)
      .map { case (n, h) => s""""$n": "$h"""" }
      .mkString("{", ", ", "}")
    val out = fs.create(manifestPath, true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
  }

  private[graft] def modifiedSince(modelSql: Map[String, String])
      : Set[String] = {
    val prev = readManifest()
    modelSql.collect {
      case (n, s) if !prev.get(n).contains(sha(s)) => n
    }.toSet
  }

  /** Render, translate, and wire the model DAG; resolve --select and
    * warehouse-resident upstreams. Shared by [[run]] and [[build]]. */
  private def prepare(modelSql: Map[String, String],
      sources: Map[String, DataFrame],
      materializations: Map[String, Materialization],
      tags: Map[String, Set[String]],
      select: Option[String],
      fullRefresh: Boolean,
      exclude: Option[String] = None): Seq[Model] = {
    sources.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val models = modelSql.map { case (name, sql) =>
      // render Jinja FIRST: a ref() inside a false {% if %} branch
      // must not become a DAG edge (the branch never executes)
      def renderWith(inc: Boolean): Jinja.Result = Jinja.render(sql, vars,
        envVars, macros,
        bindings = Map(
          "this" -> Jinja.JRaw(s"${name}__this"),
          // {{ target.name }} / .schema / .dataset / .database — the
          // env-switching object real projects branch on; name
          // defaults to dbt's own default target name
          "target" -> Jinja.JMap(
            Map("name" -> Jinja.JStr(targetProps.getOrElse("name", "dev"))) ++
            targetProps.view.mapValues(Jinja.JStr(_)).toMap)),
        builtins = Map(
          "is_incremental" -> ((_: Seq[Jinja.JV]) => Jinja.JBool(inc))
        ) ++ DbtSqlEngine.dbtUtilsBuiltins)
      val first = renderWith(false)
      val uniqueKey = first.config.get("unique_key").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      // dbt's on_schema_change config (default ignore); validated in
      // Incremental.merge so a typo fails the first fold, not silently
      val onSchemaChange =
        first.config.getOrElse("on_schema_change", "ignore")
      val mat = first.config.get("materialized") match {
        case Some("table") => Materialization.Table
        case Some("view") => Materialization.View
        case Some("incremental") =>
          Materialization.Incremental(uniqueKey, onSchemaChange)
        case Some(other) => throw new IllegalArgumentException(
          s"model $name: unsupported config(materialized='$other')")
        case None => materializations.getOrElse(name, Materialization.View) match {
          // a policy-level incremental still honors the model's own
          // config(unique_key=...)
          case Materialization.Incremental(_, _) =>
            Materialization.Incremental(uniqueKey, onSchemaChange)
          case other => other
        }
      }
      val targetPath = new org.apache.hadoop.fs.Path(s"$warehouseDir/$name")
      // dbt --full-refresh: drop and rebuild incremental targets; the
      // model's own config(full_refresh=...) overrides the flag in
      // BOTH directions (false protects a huge table from an
      // accidental rebuild; true always rebuilds), dbt's precedence
      val modelFullRefresh =
        first.config.get("full_refresh").map(_.toLowerCase) match {
          case Some("true") => true
          case Some("false") => false
          case _ => fullRefresh
        }
      if (modelFullRefresh && mat.isInstanceOf[Materialization.Incremental]
          && fs.exists(targetPath))
        fs.delete(targetPath, true)
      val incrementalRun = mat.isInstanceOf[Materialization.Incremental] &&
        fs.exists(targetPath)
      val r = if (incrementalRun) renderWith(true) else first
      val translated = BigQueryDialect.translate(r.text, currentDateOverride)
      val modelTags = tags.getOrElse(name, Set.empty) ++
        first.config.get("tags").toSeq.flatMap(_.split(","))
          .map(_.trim).filter(_.nonEmpty)
      Model(name, BigQueryDialect.refs(r.text), mat, tags = modelTags)({ _ =>
        // {{ this }} resolves to the resident target as of THIS run
        if (incrementalRun)
          spark.read.parquet(targetPath.toString)
            .createOrReplaceTempView(s"${name}__this")
        spark.sql(translated)
      })
    }.toSeq
    ModelGraph.topoSort(models) // fail fast on cycles before any work
    val chosen = (select, exclude) match {
      case (None, None) => models
      case (sel, ex) =>
        // compute the changed-set lazily: only a state:modified token
        // pays the manifest read
        val needState = (sel.toSeq ++ ex.toSeq)
          .exists(_.contains("state:modified"))
        ModelGraph.select(models,
          sel.getOrElse(models.map(_.name).mkString(" ")),
          ex.getOrElse(""),
          if (needState) modifiedSince(modelSql) else Set.empty)
    }
    // dbt --select semantics: unselected upstreams are read from the
    // warehouse (they persist there from earlier runs). In this
    // engine only Table/Incremental materializations persist; a
    // selected model depending on an unselected VIEW that was never
    // materialized fails loudly with the fix spelled out.
    if (chosen.size != models.size) {
      val chosenNames = chosen.map(_.name).toSet
      val allNames = models.map(_.name).toSet
      chosen.flatMap(_.deps).distinct
        .filter(d => allNames.contains(d) && !chosenNames.contains(d))
        .foreach { d =>
          val p = new org.apache.hadoop.fs.Path(s"$warehouseDir/$d")
          require(fs.exists(p),
            s"selected models depend on '$d', which is not selected and " +
            "has no materialized table in the warehouse — widen the " +
            s"selector (e.g. '+<name>') or run '$d' first")
          spark.read.parquet(p.toString).createOrReplaceTempView(d)
        }
    }
    chosen
  }
}

object DbtSqlEngine {
  /** The dbt_utils macros real projects lean on hardest, as Jinja
    * builtins expanding to the cross-database SQL dbt_utils itself
    * generates (same null sentinel, same '-' separator — a surrogate
    * key computed here matches one computed by dbt+dbt_utils on the
    * same rows). */
  private[sql] val dbtUtilsBuiltins: Map[String, Seq[Jinja.JV] => Jinja.JV] = Map(
    "dbt_utils.generate_surrogate_key" -> { args =>
      val fields = args.headOption match {
        case Some(Jinja.JList(xs)) => xs.map {
          case Jinja.JStr(s) => s
          case other => throw new IllegalArgumentException(
            s"generate_surrogate_key: expected column-name strings, got $other")
        }
        case Some(Jinja.JStr(s)) => Seq(s)
        case _ => throw new IllegalArgumentException(
          "generate_surrogate_key takes a list of column names")
      }
      Jinja.JRaw("md5(" + fields.map(f =>
        s"coalesce(cast($f as string), '_dbt_utils_surrogate_key_null_')")
        .mkString(" || '-' || ") + ")")
    },
    "dbt_utils.safe_cast" -> { args =>
      args match {
        case Seq(Jinja.JStr(expr), Jinja.JStr(tpe)) =>
          Jinja.JRaw(s"try_cast($expr as $tpe)")
        case _ => throw new IllegalArgumentException(
          "safe_cast(field, type) takes two strings")
      }
    })
}
