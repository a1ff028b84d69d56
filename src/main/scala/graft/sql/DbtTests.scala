package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import MiniYaml._

/** dbt schema-yml data tests, discovered and RUN from the project
  * checkout — the `dbt test` half of the switch story
  * ([[DbtProject]] is the `dbt run` half). Supported test surface
  * (the standard four generics plus the one dbt_utils test the
  * reference declares — `marts_schema.yml:6-15`):
  *
  *  - column `not_null`, `unique`
  *  - column `accepted_values:` (`values:` list; NULLs pass, dbt's
  *    semantics)
  *  - column `relationships:` (`to: ref('parent')`, `field: col`;
  *    NULL child keys pass, dbt's semantics)
  *  - model-level `dbt_utils.unique_combination_of_columns:`
  *    (`combination_of_columns:` list)
  *
  * Anything else fails loudly at parse time — a silently skipped
  * test is worse than a missing one. Each test computes ONE
  * aggregate (violation count) against the materialized frame —
  * the dbt contract (a test is a query returning violating rows;
  * status = empty ⇔ pass).
  */
object DbtTests {

  /** One declared test: the owning model, the column (None for
    * model-level tests), the test kind, its params, and its dbt test
    * CONFIG (`severity`, `error_if`, `warn_if`, `where` — inline or
    * under a nested `config:` key). */
  final case class DataTest(model: String, column: Option[String],
      kind: String, params: Map[String, Seq[String]],
      config: Map[String, String] = Map.empty)

  private val supported = Set("not_null", "unique", "accepted_values",
    "relationships", "dbt_utils.unique_combination_of_columns",
    "dbt_utils.expression_is_true")

  /** dbt test config keys understood here; anything else in a test's
    * `config:` block fails loudly. `quote` is accepted-and-inert on
    * accepted_values (this engine compares by value, so quoting is
    * not a degree of freedom the way it is in generated SQL).
    * `store_failures: true` persists the test's violating rows under
    * `<warehouse>/dbt_test__audit/` (dbt's audit-schema analog). */
  private val configKeys = Set("severity", "error_if", "warn_if",
    "where", "quote", "store_failures")

  /** Filesystem-safe audit table name for a stored test result. */
  def auditName(model: String, label: String): String =
    s"${model}__$label".replaceAll("\\W+", "_")

  /** dbt's test-status rule: severity 'warn' can only warn; severity
    * 'error' (the default) fails when `error_if` (default `!=0`)
    * holds against the violation count, otherwise warns when
    * `warn_if` (default `!=0`) holds, otherwise passes. Conditions
    * are `<cmp> <int>` with cmp ∈ != = > >= < <=. */
  def statusOf(n: Long, config: Map[String, String]): String = {
    def holds(cond: String): Boolean = {
      val m = """^\s*(!=|>=|<=|=|>|<)\s*(\d+)\s*$""".r
        .findFirstMatchIn(cond).getOrElse(
          throw new IllegalArgumentException(
            s"unsupported test condition '$cond' (use <cmp> <int>)"))
      val v = m.group(2).toLong
      m.group(1) match {
        case "!=" => n != v
        case "="  => n == v
        case ">"  => n > v
        case ">=" => n >= v
        case "<"  => n < v
        case "<=" => n <= v
      }
    }
    val sev = config.getOrElse("severity", "error").toLowerCase
    require(sev == "error" || sev == "warn",
      s"unsupported test severity '$sev' (error|warn)")
    if (sev == "error" && holds(config.getOrElse("error_if", "!=0"))) "fail"
    else if (holds(config.getOrElse("warn_if", "!=0"))) "warn"
    else "pass"
  }

  private def scalarsOf(n: Node, what: String): Seq[String] = n match {
    case YList(xs) => xs.map {
      case YScalar(s) => s
      case other => throw new IllegalArgumentException(
        s"$what: expected scalar list items, got $other")
    }
    case YScalar(s) => Seq(s)
    case other => throw new IllegalArgumentException(
      s"$what: expected a list or scalar, got $other")
  }

  private def scalarOf(n: Node, what: String): String = n match {
    case YScalar(s) => s
    case other => throw new IllegalArgumentException(
      s"$what: expected a scalar, got $other")
  }

  private def toTest(model: String, column: Option[String],
      node: Node): DataTest = node match {
    case YScalar(kind) =>
      require(supported.contains(kind), s"unsupported data test '$kind'")
      DataTest(model, column, kind, Map.empty)
    case YMap(Vector((kind, params))) =>
      require(supported.contains(kind), s"unsupported data test '$kind'")
      val p = scala.collection.mutable.Map.empty[String, Seq[String]]
      val cfg = scala.collection.mutable.Map.empty[String, String]
      params match {
        case pm: YMap => pm.entries.foreach {
          // dbt accepts config keys inline OR under a config: block
          case ("config", cm: YMap) => cm.entries.foreach { case (ck, cv) =>
            require(configKeys.contains(ck),
              s"unsupported test config '$ck' under $kind")
            cfg(ck) = scalarOf(cv, s"$kind.config.$ck")
          }
          case (k, v) if configKeys.contains(k) =>
            cfg(k) = scalarOf(v, s"$kind.$k")
          case (k, v) => p(k) = scalarsOf(v, s"$kind.$k")
        }
        case YNull => ()
        case other => throw new IllegalArgumentException(
          s"unsupported params for test '$kind': $other")
      }
      DataTest(model, column, kind, p.toMap, cfg.toMap)
    case other => throw new IllegalArgumentException(
      s"unsupported test declaration: $other")
  }

  /** Every test declared in one schema yml's `models:` block. A yml
    * without a `models:` list (e.g. sources.yml) declares none. */
  def parse(yml: String): Seq[DataTest] = MiniYaml.parse(yml) match {
    case m: YMap => m.get("models") match {
      case Some(YList(models)) => models.flatMap {
        case mm: YMap =>
          val name = mm.get("name") match {
            case Some(YScalar(s)) => s
            case _ => throw new IllegalArgumentException(
              "model entry without a name")
          }
          val colTests = mm.get("columns") match {
            case Some(YList(cols)) => cols.flatMap {
              case cm: YMap =>
                val cname = cm.get("name") match {
                  case Some(YScalar(s)) => s
                  case _ => throw new IllegalArgumentException(
                    s"column entry without a name under model $name")
                }
                cm.get("tests") match {
                  case Some(YList(ts)) =>
                    ts.map(toTest(name, Some(cname), _))
                  case None | Some(YNull) => Seq.empty
                  case Some(other) => throw new IllegalArgumentException(
                    s"unsupported tests form under $name.$cname: $other")
                }
              case _ => Seq.empty
            }
            case _ => Seq.empty
          }
          val modelTests = mm.get("tests") match {
            case Some(YList(ts)) => ts.map(toTest(name, None, _))
            case None | Some(YNull) => Seq.empty
            case Some(other) => throw new IllegalArgumentException(
              s"unsupported tests form under $name: $other")
          }
          colTests ++ modelTests
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }
    case _ => Seq.empty
  }

  /** `ref('x')` / `source('a', 'x')` → the relation name x. */
  private def refName(toExpr: String): String = {
    val refRe = """ref\(\s*'(\w+)'\s*\)""".r
    val srcRe = """source\(\s*'[^']*'\s*,\s*'(\w+)'\s*\)""".r
    toExpr.trim match {
      case refRe(n) => n
      case srcRe(n) => n
      case bare if bare.matches("\\w+") => bare
      case other => throw new IllegalArgumentException(
        s"unsupported relationships 'to' expression: $other")
    }
  }

  /** Violating rows for one test against the model's frame — the
    * Model.checks contract (pass ⇔ empty). `resolve` supplies the
    * `relationships` target relation by name. */
  private def violatingRowsWith(t: DataTest, df0: DataFrame,
      resolve: String => DataFrame): DataFrame = {
    // dbt's `where` test config: the test runs against the filtered
    // model (rows outside the predicate can't violate)
    val df = t.config.get("where").map(w => df0.filter(expr(w)))
      .getOrElse(df0)
    t.kind match {
    case "not_null" =>
      df.filter(col(t.column.get).isNull).select(t.column.get)
    case "unique" =>
      df.filter(col(t.column.get).isNotNull)
        .groupBy(col(t.column.get)).count()
        .filter(col("count") > 1)
    case "accepted_values" =>
      val vals = t.params.getOrElse("values", throw new
          IllegalArgumentException("accepted_values without values:"))
      df.filter(col(t.column.get).isNotNull &&
        !col(t.column.get).cast("string").isin(vals: _*))
        .select(t.column.get)
    case "relationships" =>
      val parent = resolve(refName(t.params.getOrElse("to", Seq.empty)
        .headOption.getOrElse(throw new IllegalArgumentException(
          "relationships without to:"))))
      val field = t.params.getOrElse("field", Seq.empty).headOption
        .getOrElse(throw new IllegalArgumentException(
          "relationships without field:"))
      df.filter(col(t.column.get).isNotNull)
        .select(col(t.column.get).as("__k")).distinct()
        .join(parent.select(col(field).as("__k")).distinct(),
          Seq("__k"), "left_anti")
    case "dbt_utils.unique_combination_of_columns" =>
      val cols = t.params.getOrElse("combination_of_columns",
        throw new IllegalArgumentException(
          "unique_combination_of_columns without combination_of_columns:"))
      df.groupBy(cols.map(col): _*).count()
        .filter(col("count") > 1)
    case "dbt_utils.expression_is_true" =>
      // violating rows are those where the expression is NOT true
      // (false OR null — dbt_utils generates the same NOT(coalesce))
      val e = t.params.getOrElse("expression", Seq.empty).headOption
        .getOrElse(throw new IllegalArgumentException(
          "expression_is_true without expression:"))
      df.filter(!coalesce(expr(e), lit(false)))
  }
  }

  /** Violating rows with `relationships` targets resolved from the
    * session catalog — sources and completed upstreams register temp
    * views before dependents run, so a test executing right after its
    * model materializes (the gated `dbt build` shape) sees them. */
  def violatingRows(t: DataTest, df: DataFrame,
      spark: SparkSession): DataFrame =
    violatingRowsWith(t, df, n => spark.table(n))

  /** Violation count for one test — dbt's status rule (0 ⇔ pass). */
  def violations(t: DataTest, frames: Map[String, DataFrame]): Long = {
    val df = frames.getOrElse(t.model, throw new IllegalArgumentException(
      s"test on unknown model '${t.model}'"))
    violatingRowsWith(t, df, n => frames.getOrElse(n,
      throw new IllegalArgumentException(
        s"relationships target '$n' is not a known model/source"))).count()
  }

  /** Run every test; one row per test with its violation count —
    * the `dbt test` report. @return (model, column, test,
    * n_violations, status ∈ pass|warn|fail — [[statusOf]] applies the
    * test's severity/error_if/warn_if config) */
  def run(spark: SparkSession, frames: Map[String, DataFrame],
      tests: Seq[DataTest]): DataFrame = {
    import spark.implicits._
    tests.map { t =>
      val n = violations(t, frames)
      (t.model, t.column.orNull, t.kind, n, statusOf(n, t.config))
    }.toDF("model", "column", "test", "n_violations", "status")
  }
}
