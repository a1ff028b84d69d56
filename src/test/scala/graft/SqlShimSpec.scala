package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Materialization
import graft.models._
import graft.sql.{BigQueryDialect, DbtSqlEngine}

/** The strongest parity evidence we can produce: the reference's OWN
  * model SQL (read from /root/reference at test time — never copied
  * into this repo), translated by BigQueryDialect and executed by
  * DbtSqlEngine, must produce exactly the same rows as the
  * independently hand-written DataFrame models on the same fixtures.
  * Two implementations, one from SQL text, one from the DataFrame API,
  * agreeing row-for-row.
  */
class SqlShimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  val refDir = "/root/reference/models"
  val asOfDate = "2026-08-12"

  def refSql(rel: String): String =
    new String(Files.readAllBytes(Paths.get(s"$refDir/$rel")), "UTF-8")

  lazy val available: Boolean = Files.exists(Paths.get(refDir))

  lazy val sqlResults = {
    val wh = java.nio.file.Files.createTempDirectory("graft-sqlwh").toString
    new DbtSqlEngine(spark, wh, currentDateOverride = Some(asOfDate)).run(
      modelSql = Map(
        "locations_clean" -> refSql("intermediate/locations_clean.sql"),
        "stacked_users_partners" -> refSql("intermediate/stacked_users_partners.sql"),
        "user_base" -> refSql("marts/user_base.sql")),
      sources = RefFixtures.sources(spark),
      materializations = Map("user_base" -> Materialization.Table))
  }

  lazy val dfResults = {
    val env = RefFixtures.sources(spark)
    val lc = LocationsClean(env)
    val sup = StackedUsersPartners(env)
    val ub = UserBase(env ++ Map("locations_clean" -> lc, "stacked_users_partners" -> sup),
      asOf = to_date(lit(asOfDate)))
    Map("locations_clean" -> lc, "stacked_users_partners" -> sup, "user_base" -> ub)
  }

  def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(v => if (v == null) "␀" else v.toString).mkString("|"))
      .toSeq.sorted
  }

  for (model <- Seq("locations_clean", "stacked_users_partners", "user_base")) {
    test(s"reference SQL through shim == DataFrame model: $model") {
      assume(available, s"$refDir not present")
      val sqlRows = rowsOf(sqlResults(model))
      val dfRows = rowsOf(dfResults(model))
      assert(sqlRows.size === dfRows.size,
        s"row counts differ: sql=${sqlRows.size} df=${dfRows.size}")
      assert(sqlRows === dfRows)
    }
  }

  test("translator unit: SAFE_DIVIDE / SAFE_CAST / COUNTIF execute on Spark") {
    spark.range(3).selectExpr("id", "cast(id as string) s")
      .createOrReplaceTempView("shim_t")
    val df = spark.sql(BigQueryDialect.translate(
      """select safe_divide(id, 0) as d, safe_cast('x' as int) as c,
        |countif(id > 0) as n from shim_t group by id, s""".stripMargin))
    val rows = df.collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("translator unit: BigQuery CAST type names rewrite ONLY in cast positions (round 18)") {
    // type names in CAST/TRY_CAST/SAFE_CAST arguments translate…
    val t1 = BigQueryDialect.translate(
      "select cast(x as int64) a, try_cast(y as float64) b, " +
        "safe_cast(z as numeric) c, cast(w as bignumeric) d from t")
    assert(t1.contains("CAST(x as BIGINT)") &&
      t1.contains("TRY_CAST(y as DOUBLE)") &&
      t1.contains("TRY_CAST(z as DECIMAL(38,9))") &&
      t1.contains("CAST(w as DECIMAL(38,18))"), t1)
    // …including nested types the old AS-anchored regex missed…
    val t2 = BigQueryDialect.translate("select cast(x as array<int64>) from t")
    assert(t2.contains("CAST(x as array<BIGINT>)"), t2)
    // …but a column ALIAS named after a type is not renamed…
    val t3 = BigQueryDialect.translate(
      "select countif(x) as bool, y as numeric, z as datetime from t")
    assert(t3.contains("COUNT_IF(x) as bool") &&
      t3.contains("y as numeric") && t3.contains("z as datetime"), t3)
    // …and string literals are never edited, even inside a cast
    val t4 = BigQueryDialect.translate(
      "select 'keep as numeric here' s, cast(concat(x, ' as int64 ') as string) c from t")
    assert(t4.contains("'keep as numeric here'") &&
      t4.contains("' as int64 '"), t4)
  }

  test("translator unit: QUALIFY, SAFE.PARSE_DATE, DATE_DIFF, r-strings, st_distance") {
    val t1 = BigQueryDialect.translate(
      "select * from t where x = 1 qualify row_number() over (partition by a order by b) = 1")
    assert(t1.contains("except(__rn)") && t1.contains("__rn = 1"))
    val t2 = BigQueryDialect.translate(
      "select SAFE.PARSE_DATE('%Y-%m-%d', concat(a, '-', b)) from t")
    assert(t2.contains("TRY_TO_DATE(concat(a, '-', b), 'yyyy-MM-dd')"))
    val t3 = BigQueryDialect.translate("select date_diff(current_date, d, year) from t",
      currentDateOverride = Some("2026-08-12"))
    assert(t3.contains("(year(DATE '2026-08-12') - year(d))"))
    val t4 = BigQueryDialect.translate("""select regexp_contains(lower(x), r'\d{1,5}\s+\w+') from t""")
    assert(t4.contains("""(lower(x) RLIKE '\\d{1,5}\\s+\\w+')"""))
    val t5 = BigQueryDialect.translate(
      "select st_distance(st_geogpoint(lon1, lat1), st_geogpoint(lon2, lat2)) / 1609.34 from t")
    assert(t5.contains("6371008.8") && t5.contains("radians"))
  }

  test("translator unit: QUALIFY top-k, rank/dense_rank, and no-WHERE forms execute") {
    import spark.implicits._
    Seq((1, "a", 10), (1, "b", 20), (1, "c", 30), (2, "d", 40))
      .toDF("g", "x", "v").createOrReplaceTempView("qt")
    // rank() <= k without a WHERE clause
    val topk = spark.sql(BigQueryDialect.translate(
      "select * from qt qualify rank() over (partition by g order by v desc) <= 2"))
    assert(topk.count() == 3)
    assert(!topk.columns.contains("__rn"))
    // dense_rank() = 1 with a WHERE clause
    val top1 = spark.sql(BigQueryDialect.translate(
      "select * from qt where v > 10 qualify dense_rank() over (partition by g order by v desc) = 1"))
    assert(top1.select("x").as[String].collect().toSet == Set("c", "d"))
  }

  test("jinja layer: var/env_var substitution, defaults, and {% if %} branches") {
    import graft.sql.BigQueryDialect.renderJinja
    // var with value, var with default, env_var injected
    assert(renderJinja("select {{ var('lim') }}", Map("lim" -> "5")) == "select 5")
    assert(renderJinja("select {{ var('lim', '9') }}") == "select 9")
    assert(renderJinja("select '{{ env_var('REGION', 'us') }}'",
      envVars = Map.empty) == "select 'us'")
    assert(renderJinja("select '{{ env_var('REGION', 'us') }}'",
      envVars = Map("REGION" -> "eu")) == "select 'eu'")
    // equality / truthiness / else
    assert(renderJinja("a {% if var('env') == 'prod' %}P{% else %}D{% endif %} z",
      Map("env" -> "prod")) == "a P z")
    assert(renderJinja("a {% if var('env') == 'prod' %}P{% else %}D{% endif %} z",
      Map("env" -> "dev")) == "a D z")
    assert(renderJinja("{% if var('flag') %}on{% endif %}",
      Map("flag" -> "false")) == "")
    // nested ifs resolve innermost-first
    assert(renderJinja(
      "{% if var('a') %}x{% if var('b') %}y{% endif %}z{% endif %}",
      Map("a" -> "1", "b" -> "1")) == "xyz")
    assert(renderJinja(
      "{% if var('a') %}x{% if var('b') %}y{% endif %}z{% endif %}",
      Map("a" -> "1", "b" -> "")) == "xz")
    // undefined var with no default fails loudly
    intercept[IllegalArgumentException](renderJinja("{{ var('nope') }}"))
    // …but an undefined var is falsy (not an error) inside a condition
    assert(renderJinja("{% if var('nope') %}on{% else %}off{% endif %}") == "off")
    // elif chains pick the first truthy branch
    assert(renderJinja(
      "{% if var('a') == '1' %}x{% elif var('b') == '1' %}y{% else %}z{% endif %}",
      Map("a" -> "0", "b" -> "1")) == "y")
    // for loops iterate; an undefined iterable still fails loudly
    assert(renderJinja("{% for i in [1, 2, 3] %}{{ i }}{% endfor %}") == "123")
    intercept[IllegalArgumentException](renderJinja("{% for i in xs %}{{i}}{% endfor %}"))
    // unsupported statement tags still fail loudly instead of leaking
    // raw Jinja into the SQL
    intercept[IllegalArgumentException](renderJinja("{% snapshot s %}x{% endsnapshot %}"))
    // whitespace-control variants ({%- -%}, {{- -}}) now STRIP, the
    // real Jinja semantics
    assert(renderJinja("a {%- if var('x') -%} B {%- else -%} C {%- endif -%} z",
      Map("x" -> "1")) == "aBz")
    assert(renderJinja("select {{- var('lim') -}} ", Map("lim" -> "7")) == "select7")
  }

  test("jinja layer: a ref() in a dead {% if %} branch is not a DAG edge and the model runs") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-jinja").toString
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val sql = Map(
      "base" -> "select id, v from {{ source('raw', 'src_t') }}",
      "picked" -> ("select * from " +
        "{% if var('mode') == 'full' %}{{ ref('base') }}" +
        "{% else %}{{ ref('base_missing') }}{% endif %} where id <= {{ var('lim', '10') }}"))
    val out = new DbtSqlEngine(spark, wh, vars = Map("mode" -> "full"))
      .run(sql, Map("src_t" -> src))
    assert(out("picked").count() == 2)
    // and the rendered SQL's refs reflect only the live branch
    val rendered = BigQueryDialect.renderJinja(sql("picked"), Map("mode" -> "full"))
    assert(BigQueryDialect.refs(rendered) == Seq("base"))
  }

  test("translator unit: QUALIFY on explicit select-lists (aliases, qualified refs, arbitrary cmp)") {
    import spark.implicits._
    Seq((1, "a", 10), (1, "b", 20), (1, "c", 30), (2, "d", 40))
      .toDF("g", "x", "v").createOrReplaceTempView("qt")
    // explicit column list with an alias, top-1
    val t1 = spark.sql(BigQueryDialect.translate(
      "select x as name, v from qt qualify row_number() over (partition by g order by v desc) = 1"))
    assert(t1.columns.toSeq == Seq("name", "v"))
    assert(t1.as[(String, Int)].collect().toSet == Set(("c", 30), ("d", 40)))
    // qualified references survive (subquery is aliased as the table)
    val t2 = spark.sql(BigQueryDialect.translate(
      "select qt.x, qt.v from qt where g = 1 qualify rank() over (order by qt.v desc) <= 2"))
    assert(t2.as[(String, Int)].collect().toSet == Set(("b", 20), ("c", 30)))
    // inverted comparison: everything BELOW the top rank
    val t3 = spark.sql(BigQueryDialect.translate(
      "select x from qt qualify row_number() over (partition by g order by v desc) > 1"))
    assert(t3.as[String].collect().toSet == Set("a", "b"))
    // != form, nested parens inside the OVER clause
    val t4 = spark.sql(BigQueryDialect.translate(
      "select x from qt qualify row_number() over (partition by g order by coalesce(v, 0) desc) != 1"))
    assert(t4.as[String].collect().toSet == Set("a", "b"))
    // __rn never leaks through the explicit-list form
    assert(!t1.columns.contains("__rn") && !t3.columns.contains("__rn"))
    // round 13: parenthesised expressions in the select list — the
    // old regex's documented boundary — now desugar (paren-aware scan)
    val q4 = spark.sql(BigQueryDialect.translate(
      "select concat(x, '!') as xx, coalesce(v, 0) as vv from qt " +
      "qualify row_number() over (partition by g order by v desc) = 1"))
    assert(q4.columns.toSeq == Seq("xx", "vv"))
    assert(q4.as[(String, Int)].collect().toSet == Set(("c!", 30), ("d!", 40)))
    // CASE + nested calls in the list, rank() top-k
    val q5 = spark.sql(BigQueryDialect.translate(
      "select case when v >= 30 then upper(x) else x end as tag from qt " +
      "qualify rank() over (order by v desc) <= 2"))
    assert(q5.as[String].collect().toSet == Set("C", "D"))
    // grouped QUALIFY desugars (round 15) — count per x, keep the first
    val q2g = spark.sql(BigQueryDialect.translate(
      "select x, count(*) as c from qt group by x " +
      "qualify row_number() over (order by x) = 1"))
    assert(q2g.columns.toSeq == Seq("x", "c"))
    assert(q2g.count() == 1L)
    // a qualify-less SELECT ahead of a qualified one in the same
    // statement must not be spanned by the desugar (each QUALIFY binds
    // to the nearest preceding SELECT at its own depth)
    val q6 = spark.sql(BigQueryDialect.translate(
      "with base as (select g, x, v from qt), " +
      "top as (select x, v from base qualify row_number() over (partition by g order by v desc) = 1) " +
      "select x from top"))
    assert(q6.as[String].collect().toSet == Set("c", "d"))
  }

  test("translator unit: QUALIFY over a JOINED FROM (round 14 — the r13 boundary lifted)") {
    import spark.implicits._
    val left = Seq((1, "a", 10), (1, "b", 20), (2, "c", 30), (2, "d", 40),
      (3, "e", 50)).toDF("g", "x", "v")
    val dim = Seq((1, "one"), (2, "two")).toDF("g", "label")
    left.createOrReplaceTempView("jq_l")
    dim.createOrReplaceTempView("jq_d")
    // inner join + qualified refs in list AND window spec, top-1/group
    val sqlTxt =
      "select l.x, d.label, l.v from jq_l l join jq_d d on l.g = d.g " +
      "qualify row_number() over (partition by l.g order by l.v desc) = 1"
    val viaShim = spark.sql(BigQueryDialect.translate(sqlTxt))
    assert(viaShim.columns.toSeq == Seq("x", "label", "v"))
    // DataFrame equivalent, row-identical
    import org.apache.spark.sql.expressions.Window
    val viaDf = left.as("l").join(dim.as("d"), Seq("g"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy($"g").orderBy($"v".desc)))
      .filter($"__rn" === 1).select($"x", $"label", $"v")
    assert(viaShim.as[(String, String, Int)].collect().toSet ==
      viaDf.as[(String, String, Int)].collect().toSet)
    assert(viaShim.as[(String, String, Int)].collect().toSet ==
      Set(("b", "one", 20), ("d", "two", 40)))
    // star form over a joined FROM with a WHERE, left join included
    val viaStar = spark.sql(BigQueryDialect.translate(
      "select * from jq_l l left join jq_d d on l.g = d.g where l.v > 10 " +
      "qualify rank() over (order by l.v desc) <= 2"))
    assert(!viaStar.columns.contains("__rn"))
    assert(viaStar.count() == 2)
    assert(viaStar.select("x").as[String].collect().toSet == Set("d", "e"))
    // ORDER BY between FROM and QUALIFY still fails loudly (that
    // clause order is not even legal BigQuery — QUALIFY precedes it)
    val eo = intercept[IllegalArgumentException](BigQueryDialect.translate(
      "select l.x from jq_l l order by l.v " +
      "qualify row_number() over (order by l.v) = 1"))
    assert(eo.getMessage.contains("order"))
  }

  test("translator unit: QUALIFY over a GROUPED select (round 15 — GROUP BY/HAVING boundary lifted)") {
    import spark.implicits._
    val t = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5),
      ("c", 6), ("d", 7)).toDF("k", "v")
    t.createOrReplaceTempView("gq_t")
    // top-3 groups by row count: the ranker's ORDER BY references the
    // aggregate itself, so it MUST evaluate post-aggregation
    val viaShim = spark.sql(BigQueryDialect.translate(
      "select k, count(*) as c from gq_t group by k " +
      "qualify row_number() over (order by count(*) desc, k) <= 3"))
    assert(viaShim.columns.toSeq == Seq("k", "c"))
    import org.apache.spark.sql.expressions.Window
    val viaDf = t.groupBy($"k").agg(count(lit(1)).as("c"))
      .withColumn("__rn", row_number().over(
        Window.orderBy($"c".desc, $"k")))
      .filter($"__rn" <= 3).select($"k", $"c")
    assert(viaShim.as[(String, Long)].collect().toSet ==
      viaDf.as[(String, Long)].collect().toSet)
    assert(viaShim.as[(String, Long)].collect().toSet ==
      Set(("a", 3L), ("b", 2L), ("c", 1L)))
    // HAVING between GROUP BY and QUALIFY rides along in the wrap
    val viaHaving = spark.sql(BigQueryDialect.translate(
      "select k, sum(v) as s from gq_t group by k having count(*) > 1 " +
      "qualify rank() over (order by sum(v) desc) = 1"))
    assert(viaHaving.as[(String, Long)].collect().toSet == Set(("b", 9L)))
    // grouped SELECT * under QUALIFY is rejected loudly (invalid SQL)
    val es = intercept[IllegalArgumentException](BigQueryDialect.translate(
      "select * from gq_t group by k qualify row_number() over (order by k) = 1"))
    assert(es.getMessage.contains("grouped"))
  }
}
