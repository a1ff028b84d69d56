package graft.sql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.model.Materialization
import MiniYaml._

/** dbt model contracts (`contract: enforced`, dbt ≥ 1.5): the schema
  * yml pins each column's `data_type` (BigQuery dialect names — the
  * reference's warehouse) plus optional `constraints`, and the engine
  * refuses to materialize a model whose produced schema deviates —
  * loud, naming the column and both types, BEFORE anything is
  * written (dbt's own ordering: the contract check happens at DDL
  * time, ahead of the insert).
  *
  * Enforcement levels, matching dbt's adapter behavior on BigQuery:
  *  - column set + types: every enforced model, every
  *    materialization (missing, extra, and type-mismatched columns
  *    are each listed by name);
  *  - `not_null` and `check:` constraints: verified with ONE
  *    aggregate pass over the model's frame for table/incremental
  *    materializations (the warehouse-enforced subset — BigQuery
  *    rejects violating inserts for these and nothing else);
  *    declaring them on a view is loud (dbt: constraints require a
  *    materialized relation);
  *  - `primary_key` / `unique` / `foreign_key`: accepted as
  *    metadata, NOT verified — BigQuery's own DDL marks these NOT
  *    ENFORCED, and silently promising uniqueness enforcement the
  *    reference warehouse never gave would be a semantic lie. A
  *    project that wants them checked declares the corresponding
  *    data test (`unique`, `relationships`), which this engine runs.
  *
  * Scale shape: the schema check is plan-only (zero execution); the
  * constraint check is one map-side-combinable aggregate (a
  * conjunction of count-if terms), no shuffle beyond the final
  * single-row reduce.
  */
object DbtContracts {

  /** One contracted column: declared BigQuery/Spark type text plus
    * constraint descriptors (`kind` ∈ not_null | check | primary_key
    * | unique | foreign_key; `expression` set for check). */
  final case class ColumnContract(name: String, dataType: String,
      constraints: Seq[Constraint])
  final case class Constraint(kind: String, expression: Option[String])
  final case class ModelContract(enforced: Boolean,
      columns: Seq[ColumnContract])

  private val constraintKinds = Set("not_null", "check", "primary_key",
    "unique", "foreign_key")

  /** BigQuery type names → Spark DDL, then Spark's own parser. Alias
    * rewriting is word-bounded so nested types (`array<int64>`,
    * `struct<a: int64, b: string>`) resolve too. */
  def sparkType(declared: String): DataType = {
    val aliases = Map(
      "int64" -> "bigint", "integer" -> "int", "float64" -> "double",
      "bool" -> "boolean", "bytes" -> "binary",
      // BigQuery NUMERIC/DATETIME defaults; DATETIME has no zone =
      // Spark's TIMESTAMP_NTZ
      "numeric" -> "decimal(38,9)", "datetime" -> "timestamp_ntz")
    val rewritten = aliases.foldLeft(declared.trim.toLowerCase) {
      case (s, (from, to)) => s.replaceAll(s"\\b$from\\b", to)
    }
    try DataType.fromDDL(rewritten)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"contract data_type '$declared' does not resolve to a Spark " +
          s"type (tried '$rewritten'): ${e.getMessage}")
    }
  }

  /** Contracts declared in one schema yml's `models:` list. A model
    * with `contract: enforced: true` must give every column a
    * `data_type` (dbt's own rule) — loud here, at load time. */
  def parse(yml: String): Map[String, ModelContract] = {
    def scalar(n: Option[Node]): Option[String] = n match {
      case Some(YScalar(s)) if s.trim.nonEmpty => Some(s.trim)
      case _ => None
    }
    MiniYaml.parse(yml) match {
      case m: YMap => m.get("models") match {
        case Some(YList(models)) => models.flatMap {
          case mm: YMap =>
            val name = scalar(mm.get("name")).getOrElse(
              throw new IllegalArgumentException("model entry without a name"))
            val enforced = (for {
              cfg <- mm.get("config").collect { case c: YMap => c }
              con <- cfg.get("contract").collect { case c: YMap => c }
              e <- scalar(con.get("enforced"))
            } yield e.toBoolean).getOrElse(false)
            val cols = mm.get("columns") match {
              case Some(YList(cs)) => cs.flatMap {
                case cm: YMap =>
                  val cn = scalar(cm.get("name")).getOrElse(
                    throw new IllegalArgumentException(
                      s"column entry without a name under model $name"))
                  val dt = scalar(cm.get("data_type"))
                  val cons = cm.get("constraints") match {
                    case Some(YList(items)) => items.map {
                      case YScalar(k) => mkConstraint(name, cn, k, None)
                      case im: YMap =>
                        val k = scalar(im.get("type")).getOrElse(
                          throw new IllegalArgumentException(
                            s"constraint without a type under $name.$cn"))
                        mkConstraint(name, cn, k,
                          scalar(im.get("expression")))
                      case other => throw new IllegalArgumentException(
                        s"unsupported constraint form under $name.$cn: $other")
                    }
                    case None | Some(YNull) => Seq.empty
                    case Some(other) => throw new IllegalArgumentException(
                      s"unsupported constraints form under $name.$cn: $other")
                  }
                  // bare (untyped, unconstrained) columns are KEPT:
                  // an enforced contract must name them in its
                  // missing-data_type complaint below
                  Some(ColumnContract(cn, dt.getOrElse(""), cons))
                case _ => None
              }
              case _ => Seq.empty
            }
            if (!enforced && cols.forall(c =>
                c.dataType.isEmpty && c.constraints.isEmpty)) None
            else {
              if (enforced) {
                val untyped = cols.collect {
                  case c if c.dataType.isEmpty => c.name }
                require(untyped.isEmpty, s"model $name: contract is " +
                  "enforced but column(s) lack data_type: " +
                  untyped.mkString(", ") + " (dbt requires a type for " +
                  "every contracted column)")
                require(cols.nonEmpty, s"model $name: contract is " +
                  "enforced but no columns are declared")
                // declared types must RESOLVE at load time, not at run
                cols.foreach(c => sparkType(c.dataType))
              }
              Some(name -> ModelContract(enforced, cols))
            }
          case _ => None
        }.toMap
        case _ => Map.empty
      }
      case _ => Map.empty
    }
  }

  private def mkConstraint(model: String, colName: String, kind: String,
      expression: Option[String]): Constraint = {
    require(constraintKinds.contains(kind),
      s"model $model.$colName: unsupported constraint type '$kind' " +
        s"(dbt allows: ${constraintKinds.toSeq.sorted.mkString(", ")})")
    if (kind == "check") require(expression.exists(_.trim.nonEmpty),
      s"model $model.$colName: check constraint needs an expression")
    Constraint(kind, expression)
  }

  /** The run-time gate: schema first (plan-only), then the enforced
    * constraint subset in one aggregate. Returns the frame untouched
    * when everything holds; throws naming every deviation when not. */
  def enforce(name: String, mat: Materialization, df: DataFrame,
      c: ModelContract): DataFrame = {
    if (!c.enforced) return df
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val declared = c.columns.map(_.name)
    val missing = declared.filterNot(actual.contains)
    val extra = df.schema.fieldNames.filterNot(declared.toSet)
    val mismatched = c.columns.flatMap { cc =>
      actual.get(cc.name).flatMap { at =>
        val want = sparkType(cc.dataType)
        if (at == want) None
        else Some(s"column '${cc.name}' is ${at.sql}, contract declares " +
          s"${cc.dataType} (= ${want.sql})")
      }
    }
    val problems =
      (if (missing.nonEmpty)
        Seq(s"missing contracted column(s): ${missing.mkString(", ")}")
      else Seq.empty) ++
      (if (extra.nonEmpty)
        Seq(s"column(s) not in the contract: ${extra.mkString(", ")}")
      else Seq.empty) ++ mismatched
    require(problems.isEmpty,
      s"model $name violates its enforced contract:\n  " +
        problems.mkString("\n  "))
    val checked = c.columns.flatMap { cc =>
      cc.constraints.collect {
        case Constraint("not_null", _) =>
          (s"not_null(${cc.name})", col(cc.name).isNull)
        // SQL CHECK semantics: TRUE and UNKNOWN (NULL) both pass —
        // only a definite FALSE violates
        case Constraint("check", Some(e)) =>
          (s"check(${cc.name}: $e)", coalesce(!expr(e), lit(false)))
      }
    }
    if (checked.nonEmpty) {
      require(mat != Materialization.View && mat != Materialization.Ephemeral,
        s"model $name: not_null/check constraints require a " +
          "materialized relation (table or incremental) — dbt does not " +
          "support enforced constraints on views either")
      // Pin the model's rows ONCE and both verify and return the
      // pinned frame: aggregating `df` directly would execute the
      // model a first time here and a second time when the Runner
      // materializes it — and for a non-deterministic model
      // (current_timestamp, rand) the rows checked would not be the
      // rows written, so a contract could pass while violating rows
      // land on disk. The checkpoint is released on the failure path
      // (nothing downstream may read it); on success the Runner
      // writes it and the session's releaseAll reclaims the blocks.
      val pinned = df.localCheckpoint()
      // one pass, one reduced row: a count-if per constraint
      val counts = pinned.agg(
        count(lit(1)).as("_n"),
        checked.map { case (label, bad) =>
          sum(when(bad, 1L).otherwise(0L)).as(label) }: _*).head()
      val violated = checked.zipWithIndex.collect {
        case ((label, _), i) if counts.getLong(i + 1) > 0 =>
          s"$label: ${counts.getLong(i + 1)} violating row(s)"
      }
      if (violated.nonEmpty) {
        graft.ext.Checkpoints.release(pinned)
        throw new IllegalArgumentException(
          s"requirement failed: model $name violates its contract " +
            s"constraints:\n  " + violated.mkString("\n  "))
      }
      pinned
    } else df
  }
}
