package graft.sql

import scala.util.matching.Regex

/** BigQuery-dialect → Spark SQL translator covering the constructs the
  * reference's models actually use (SURVEY §2.10): Jinja
  * source()/ref() resolution, raw r'' strings, SAFE.PARSE_DATE,
  * FORMAT_DATE, DATE_DIFF argument order + unit semantics,
  * ST_GEOGPOINT/ST_DISTANCE, REGEXP_CONTAINS, QUALIFY row_number()=1,
  * and optional current_date pinning. `SELECT * EXCEPT(...)` and
  * ordinal GROUP BY are native in Spark 4 and pass through.
  *
  * This is a pragmatic textual shim (the reference corpus is 372 lines
  * of SQL in a known shape), not a full BigQuery parser: QUALIFY is
  * desugared for star AND explicit select lists, over single-table or
  * JOINED froms, with any of row_number/rank/dense_rank and any
  * integer comparison (see [[desugarQualify]] for the exact
  * boundary); the reference itself only uses the
  * `select * … qualify row_number() over (…) = 1` form
  * (locations_clean.sql:83,89,95).
  */
object BigQueryDialect {

  private val sourceRe: Regex = """\{\{\s*source\(\s*'[^']*'\s*,\s*'(\w+)'\s*\)\s*\}\}""".r
  private val refRe: Regex = """\{\{\s*ref\(\s*'(\w+)'\s*\)\s*\}\}""".r

  /** Model dependencies: names pulled in via {{ ref(...) }}. */
  def refs(sql: String): Seq[String] = refRe.findAllMatchIn(sql).map(_.group(1)).toSeq

  /** Source tables pulled in via {{ source(...) }}. */
  def sources(sql: String): Seq[String] = sourceRe.findAllMatchIn(sql).map(_.group(1)).toSeq

  // ---- Jinja layer beyond ref()/source() (SURVEY §2.11 gap #2) ----
  // Delegates to [[Jinja]], a small real template engine: {% if %}/
  // {% elif %}/{% else %}, {% for %} with loop.*, {% set %},
  // {% macro %} definitions and calls, var()/env_var() with defaults,
  // config() capture, comments, and whitespace control — anything
  // outside that surface fails loudly (raw Jinja must never leak into
  // SQL). ref()/source() calls re-emit their tag text verbatim so DAG
  // extraction and table resolution keep operating on rendered output.

  /** Render the supported Jinja surface. `envVars` defaults to the
    * real process environment, like dbt; inject a map for hermetic
    * tests. Project macros and `config(...)` capture are available
    * through [[renderJinjaWithConfig]]. */
  def renderJinja(sql: String, vars: Map[String, String] = Map.empty,
      envVars: Map[String, String] = sys.env): String =
    Jinja.render(sql, vars, envVars).text

  /** Render with project macros in scope; also returns the model's
    * `config(...)` kwargs (dbt's in-model materialization override). */
  def renderJinjaWithConfig(sql: String, vars: Map[String, String],
      envVars: Map[String, String],
      macros: Map[String, Jinja.MacroDef]): Jinja.Result =
    Jinja.render(sql, vars, envVars, macros)

  /** %-style BigQuery date format → JVM DateTimeFormatter pattern. */
  def mapDateFormat(fmt: String): String =
    fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
      .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")

  /** Find the argument list of `fn(` starting at the '(' after `from`,
    * returning (args, endIndexExclusiveOfClosingParen). Splits on
    * top-level commas, respects nesting and quoted strings. */
  private def parseArgs(s: String, openParen: Int): (Seq[String], Int) = {
    var depth = 0; var i = openParen; var inStr = false
    val args = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; if (depth > 1) cur += c
        case ')' =>
          depth -= 1
          if (depth == 0) { args += cur.toString.trim; return (args.toSeq, i + 1) }
          cur += c
        case ',' if depth == 1 => args += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens after offset $openParen")
  }

  /** Apply `f` to the text between single-quoted string literals,
    * leaving the literals themselves (and their quotes) untouched —
    * the masking step for rewrites that must never edit data. */
  private def mapUnquoted(text: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var inStr = false
    for (c <- text) {
      if (inStr) { out += c; if (c == '\'') inStr = false }
      else if (c == '\'') { out.append(f(seg.toString)); seg.clear(); out += c; inStr = true }
      else seg += c
    }
    out.append(f(seg.toString))
    out.toString
  }

  /** Rewrite every `name(args…)` using `build(args)`, case-insensitive. */
  private def rewriteCalls(sql: String, name: String)(build: Seq[String] => String): String = {
    val lower = name.toLowerCase
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val idx = sql.toLowerCase.indexOf(lower + "(", i) match {
        case -1 => -1
        // require a non-word char before the name (avoid suffix matches)
        case j if j > 0 && (sql.charAt(j - 1).isLetterOrDigit || sql.charAt(j - 1) == '_' || sql.charAt(j - 1) == '.') =>
          // skip this occurrence; continue scanning after it
          out.append(sql.substring(i, j + 1)); i = j + 1; -2
        case j => j
      }
      idx match {
        case -1 => out.append(sql.substring(i)); return out.toString
        case -2 => // already advanced
        case j =>
          out.append(sql.substring(i, j))
          val (args, end) = parseArgs(sql, j + lower.length)
          out.append(build(args))
          i = end
      }
    }
    out.toString
  }

  /** The haversine ST_DISTANCE in meters (sphere R=6371008.8 m; BigQuery
    * uses a spheroid, ≤0.5% difference — SURVEY §7.3 risk register). */
  private def haversineMetersSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"(6371008.8 * 2 * asin(sqrt(pow(sin(radians(($lat2) - ($lat1)) / 2), 2) " +
    s"+ cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians(($lon2) - ($lon1)) / 2), 2))))"

  /** QUALIFY desugar, paren-aware (round 13 — replaces the earlier
    * regex whose select lists could not contain parenthesised
    * expressions). Handled shape, at ANY nesting depth (CTE bodies,
    * derived tables): `select <list> from <tbl> [where …] qualify
    * row_number()/rank()/dense_rank() OVER (...) <cmp> <int>` where
    * <list> is `*` or ANY select list (function calls, CASE, nested
    * parens all fine — the list is delimited by the depth-matched
    * FROM, not by a parens-free guard), <tbl> is a table name OR any
    * JOIN chain / derived table (round 14 — the qualified select is
    * wrapped whole, so aliases in the list and the window spec keep
    * their FROM scope), and <cmp> is any of = <= < >= > != <>. Each
    * QUALIFY binds to the nearest preceding SELECT at its own paren
    * depth, so a qualify-less SELECT earlier in the statement is
    * never spanned. GROUP BY/HAVING between FROM and QUALIFY is
    * handled (round 15): the whole grouped select wraps as the derived
    * table with the ranker appended post-aggregation. Boundary (loud,
    * not silent): ORDER BY / WINDOW between FROM and QUALIFY throws
    * with a message naming the limitation. */
  private[graft] def desugarQualify(sql: String): String = {
    // one pass: keyword occurrences outside strings, with paren depth
    final case class Kw(word: String, pos: Int, end: Int, depth: Int)
    val lower = sql.toLowerCase
    val kws = scala.collection.mutable.ArrayBuffer.empty[Kw]
    var depth = 0; var inStr = false; var i = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; i += 1 }
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c.isLetter && (i == 0 || !isWord(lower.charAt(i - 1)))) {
        var j = i + 1
        while (j < lower.length && isWord(lower.charAt(j))) j += 1
        val w = lower.substring(i, j)
        if (Set("select", "from", "where", "qualify", "group", "having",
            "join", "order", "window").contains(w))
          kws += Kw(w, i, j, depth)
        i = j
      } else i += 1
    }
    val q = kws.find(_.word == "qualify").getOrElse(return sql)
    val d = q.depth
    val sel = kws.filter(k => k.word == "select" && k.depth == d && k.pos < q.pos)
      .lastOption.getOrElse(throw new IllegalArgumentException(
        s"QUALIFY with no SELECT at its depth: ${sql.substring(q.pos)}"))
    def between(w: String) = kws.find(k =>
      k.word == w && k.depth == d && k.pos > sel.pos && k.pos < q.pos)
    val from = between("from").getOrElse(throw new IllegalArgumentException(
      "QUALIFY without a FROM clause is not supported"))
    for (bad <- Seq("order", "window"))
      if (between(bad).isDefined) throw new IllegalArgumentException(
        s"QUALIFY shim boundary: $bad between FROM and QUALIFY is not supported " +
        "(rewrite as a derived table)")
    // GROUP BY/HAVING between FROM and QUALIFY (round 15): legal
    // BigQuery — QUALIFY evaluates AFTER grouping, and a window
    // function in a grouped select already sees the aggregated rows
    val grouped = between("group").isDefined || between("having").isDefined
    val where = between("where")
    // FROM extent: up to the first depth-matched WHERE (or QUALIFY).
    // JOIN ... ON chains live inside this span; their ON predicates
    // cannot contain a same-depth WHERE, so the boundary is exact.
    val list = sql.substring(sel.end, from.pos).trim
    val tbl = sql.substring(from.end, where.map(_.pos).getOrElse(q.pos)).trim
    val whereTxt = where.map(w => " where " + sql.substring(w.end, q.pos).trim)
      .getOrElse("")
    // the ranked window expression after QUALIFY: ranker() over (...)
    val after = sql.substring(q.end)
    val rankRe = """(?is)^\s*(row_number|rank|dense_rank)\s*\(\s*\)\s*over\s*\(""".r
    val rm = rankRe.findFirstMatchIn(after).getOrElse(
      throw new IllegalArgumentException(
        "QUALIFY shim boundary: only row_number()/rank()/dense_rank() " +
        s"OVER (...) <cmp> <int> is supported, got: ${after.take(60)}"))
    // balanced scan to the OVER clause's closing paren
    var od = 1; var k = q.end + rm.end; var inS = false
    while (k < sql.length && od > 0) {
      val c = sql.charAt(k)
      if (inS) { if (c == '\'') inS = false }
      else if (c == '\'') inS = true
      else if (c == '(') od += 1
      else if (c == ')') od -= 1
      k += 1
    }
    if (od != 0) throw new IllegalArgumentException(
      "unbalanced OVER clause after QUALIFY")
    val ranker = sql.substring(q.end + rm.start(1) - rm.start, k).trim
    val cmpRe = """(?s)^\s*(=|<=|<|>=|>|!=|<>)\s*(\d+)""".r
    val cm = cmpRe.findFirstMatchIn(sql.substring(k)).getOrElse(
      throw new IllegalArgumentException(
        s"QUALIFY shim boundary: expected <cmp> <int> after OVER (...), got: ${sql.substring(k).take(40)}"))
    val pred = s"__rn ${cm.group(1)} ${cm.group(2)}"
    val replacement =
      if (grouped) {
        if (list == "*") throw new IllegalArgumentException(
          "QUALIFY over a grouped SELECT * is not valid SQL — " +
          "a grouped select needs an explicit select list")
        // the WHOLE grouped select (from/where/group by/having spans
        // included verbatim) becomes the derived table, with the ranker
        // appended to its list — the rank is computed post-aggregation
        // (so `row_number() over (order by count(*) desc)` sees the
        // grouped rows) and the outer query only filters it out,
        // exactly BigQuery's QUALIFY evaluation order.
        val body = sql.substring(from.end, q.pos).trim
        s"select * except(__rn) from (select $list, $ranker as __rn " +
        s"from $body) where $pred"
      }
      else if (list == "*")
        s"select * except(__rn) from (select *, $ranker as __rn " +
        s"from $tbl$whereTxt) where $pred"
      else if (tbl.matches("\\w+"))
        s"select $list from (select *, $ranker as __rn " +
        s"from $tbl$whereTxt) $tbl where $pred"
      else
        // joined/derived FROM (round 14): the select list and the
        // ranker both evaluate INSIDE one derived table where every
        // FROM relation's alias is still in scope (qualified refs
        // like a.x stay valid in both); the outer query only filters
        // on the rank and drops it — exactly BigQuery's QUALIFY
        // evaluation order (window computed with FROM scope, filter
        // applied after).
        s"select * except(__rn) from (select $list, $ranker as __rn " +
        s"from $tbl$whereTxt) where $pred"
    // recurse: later QUALIFYs (other CTEs / deeper tables) still pending
    desugarQualify(sql.substring(0, sel.pos) + replacement +
      sql.substring(k + cm.end))
  }

  /** Translate one model's BigQuery SQL to Spark SQL.
    * @param currentDateOverride pin `current_date` to a literal
    *        ISO date for deterministic results (risk register §7.3). */
  def translate(bqSql: String, currentDateOverride: Option[String] = None): String = {
    var s = bqSql
    // 1. Jinja resolution: names become (temp-view) table names
    s = sourceRe.replaceAllIn(s, m => m.group(1))
    s = refRe.replaceAllIn(s, m => m.group(1))
    // 2. raw strings: r'…' — escape backslashes for Spark's literal
    // parser. The lookbehind demands a delimiter before the r: without
    // it, `like 'Other' then '…'` would parse `r' then '` as a raw
    // string and eat the trailing r of "Other".
    s = """(?<=[\s(,=])r'([^']*)'""".r.replaceAllIn(s,
      m => Regex.quoteReplacement("'" + m.group(1).replace("\\", "\\\\") + "'"))
    // 3. SAFE.PARSE_DATE(fmt, x) -> TRY_TO_DATE(x, jvmFmt)
    s = rewriteCalls(s, "safe.parse_date") { args =>
      val fmt = mapDateFormat(args.head.stripPrefix("'").stripSuffix("'"))
      s"TRY_TO_DATE(${args(1)}, '$fmt')"
    }
    // 4. FORMAT_DATE(fmt, d) -> DATE_FORMAT(d, jvmFmt)
    s = rewriteCalls(s, "format_date") { args =>
      val fmt = mapDateFormat(args.head.stripPrefix("'").stripSuffix("'"))
      s"DATE_FORMAT(${args(1)}, '$fmt')"
    }
    // 5. DATE_DIFF(a, b, unit) — BigQuery boundary-crossing semantics
    s = rewriteCalls(s, "date_diff") { args =>
      args(2).trim.toLowerCase match {
        case "year"  => s"(year(${args(0)}) - year(${args(1)}))"
        case "month" => s"((year(${args(0)}) - year(${args(1)})) * 12 + (month(${args(0)}) - month(${args(1)})))"
        case "day"   => s"datediff(${args(0)}, ${args(1)})"
        case u => throw new IllegalArgumentException(s"DATE_DIFF unit $u not supported")
      }
    }
    // 6. ST_DISTANCE(ST_GEOGPOINT(lon1,lat1), ST_GEOGPOINT(lon2,lat2))
    s = rewriteCalls(s, "st_distance") { args =>
      def point(a: String): (String, String) = {
        val inner = a.trim
        require(inner.toLowerCase.startsWith("st_geogpoint("),
          s"st_distance arg must be st_geogpoint(...), got: $inner")
        val (pargs, _) = parseArgs(inner, inner.indexOf('('))
        (pargs(1), pargs(0)) // (lat, lon)
      }
      val (lat1, lon1) = point(args(0)); val (lat2, lon2) = point(args(1))
      haversineMetersSql(lat1, lon1, lat2, lon2)
    }
    // 7. REGEXP_CONTAINS(s, p) -> (s RLIKE p)
    s = rewriteCalls(s, "regexp_contains")(args => s"(${args(0)} RLIKE ${args(1)})")
    // 7b. SAFE_DIVIDE / SAFE_CAST / COUNTIF -> Spark's try_/count_if
    s = rewriteCalls(s, "safe_divide")(args => s"TRY_DIVIDE(${args(0)}, ${args(1)})")
    s = """(?i)\bSAFE_CAST\s*\(""".r.replaceAllIn(s, "TRY_CAST(")
    s = """(?i)\bCOUNTIF\s*\(""".r.replaceAllIn(s, "COUNT_IF(")
    // 7c. BigQuery type names in CAST targets ONLY (round 18): the
    // rewrite used to run `AS <type>` over the whole statement, so it
    // also renamed column aliases (`count_if(x) AS bool` silently
    // became `AS BOOLEAN`, breaking downstream refs/contracts) and
    // edited string literals containing e.g. 'as numeric'. It is now
    // confined to CAST/TRY_CAST argument text with quoted literals
    // masked; SAFE_CAST became TRY_CAST in 7b, so both spellings land
    // here. Word-bounded replacement inside the argument also covers
    // nested types (`CAST(x AS ARRAY<INT64>)`), which the AS-anchored
    // regex missed.
    val bqCastTypes = Seq("INT64" -> "BIGINT", "FLOAT64" -> "DOUBLE",
      "BOOL" -> "BOOLEAN", "BYTES" -> "BINARY",
      "NUMERIC" -> "DECIMAL(38,9)", "BIGNUMERIC" -> "DECIMAL(38,18)",
      "DATETIME" -> "TIMESTAMP_NTZ")
    def bqTypeNames(text: String): String = mapUnquoted(text) { seg =>
      bqCastTypes.foldLeft(seg) { case (acc, (bq, sp)) =>
        s"""(?i)\\b$bq\\b""".r.replaceAllIn(acc, sp)
      }
    }
    for (fn <- Seq("cast", "try_cast"))
      s = rewriteCalls(s, fn)(args =>
        s"${fn.toUpperCase}(${args.map(bqTypeNames).mkString(", ")})")
    // 8. QUALIFY <ranker>() over (…) <cmp> k — star or ANY select
    // list, paren-aware, any nesting depth. The explicit-list form
    // aliases the ranked subquery AS the source table name so
    // qualified column references in the list keep resolving; __rn
    // never leaks (the outer list doesn't name it).
    s = desugarQualify(s)
    // 9. pin current_date for determinism
    currentDateOverride.foreach { d =>
      s = """(?i)\bcurrent_date\b""".r.replaceAllIn(s, s"DATE '$d'")
    }
    s
  }
}
