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
  * desugared for star AND explicit parens-free select lists with any
  * of row_number/rank/dense_rank and any integer comparison (see
  * [[qualifyRe]] for the exact boundary); the reference itself only
  * uses the `select * … qualify row_number() over (…) = 1` form
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
  // dbt's everyday templating surface: project vars, environment
  // vars, and conditional blocks. Grammar is deliberately small and
  // documented: var('n') / var('n', default), env_var('N') /
  // env_var('N', default), and {% if C %}…{% else %}…{% endif %}
  // where C is var('n'), var('n') ==/!= 'lit', true, or false.
  // Nested ifs evaluate innermost-first. Loops/set/macro-def remain
  // out of scope (the reference uses none of this — its only macro,
  // coalesce_trim, resolves separately).

  // `-?` after `{%`/`{{` and before `%}`/`}}`: Jinja's whitespace-
  // control tags ({%- if -%}, {{- var -}}) are everyday dbt style; we
  // accept them without implementing the whitespace stripping (SQL
  // whitespace is insignificant)
  private val varRe: Regex =
    """\{\{-?\s*var\(\s*'([^']+)'\s*(?:,\s*('[^']*'|[^)\s][^)]*?))?\s*\)\s*-?\}\}""".r
  private val envVarRe: Regex =
    """\{\{-?\s*env_var\(\s*'([^']+)'\s*(?:,\s*'([^']*)')?\s*\)\s*-?\}\}""".r
  private val ifRe: Regex =
    ("""(?s)\{%-?\s*if\s+((?:(?!%\}|\{%).)*?)\s*-?%\}((?:(?!\{%-?\s*(?:if|endif)).)*?)""" +
     """(?:\{%-?\s*else\s*-?%\}((?:(?!\{%-?\s*(?:if|endif)).)*?))?\{%-?\s*endif\s*-?%\}""").r

  private def truthy(v: String): Boolean =
    v.nonEmpty && v != "false" && v != "0" && v != "none"

  private def evalCond(cond: String, vars: Map[String, String]): Boolean = {
    val eqRe = """var\(\s*'([^']+)'\s*\)\s*(==|!=)\s*'([^']*)'""".r
    val bareRe = """var\(\s*'([^']+)'\s*\)""".r
    cond.trim match {
      case "true" => true
      case "false" => false
      case eqRe(n, op, lit) =>
        val v = vars.getOrElse(n,
          throw new IllegalArgumentException(s"undefined var '$n' in {% if %}"))
        if (op == "==") v == lit else v != lit
      case bareRe(n) => truthy(vars.getOrElse(n, ""))
      case other => throw new IllegalArgumentException(
        s"unsupported {% if %} condition: $other")
    }
  }

  /** Render the supported Jinja surface: conditionals first (so refs
    * in dead branches disappear before DAG extraction), then var /
    * env_var substitution. `envVars` defaults to the real process
    * environment, like dbt; inject a map for hermetic tests. */
  def renderJinja(sql: String, vars: Map[String, String] = Map.empty,
      envVars: Map[String, String] = sys.env): String = {
    var s = sql
    // innermost-first fixed point: each pass resolves every if-block
    // whose body contains no nested if
    var changed = true
    while (changed) {
      val next = ifRe.replaceAllIn(s, m =>
        Regex.quoteReplacement(
          if (evalCond(m.group(1), vars)) m.group(2)
          else Option(m.group(3)).getOrElse("")))
      changed = next != s
      s = next
    }
    // any surviving statement tag means unsupported Jinja (elif, for,
    // set, macro, unbalanced if) — fail loudly, never emit raw tags
    if (s.contains("{%")) throw new IllegalArgumentException(
      "unsupported or unbalanced Jinja statement block after rendering: " +
        s.substring(s.indexOf("{%"), math.min(s.length, s.indexOf("{%") + 40)))
    s = varRe.replaceAllIn(s, { m =>
      val dflt = Option(m.group(2)).map(_.stripPrefix("'").stripSuffix("'"))
      Regex.quoteReplacement(vars.get(m.group(1)).orElse(dflt).getOrElse(
        throw new IllegalArgumentException(
          s"undefined var '${m.group(1)}' with no default")))
    })
    s = envVarRe.replaceAllIn(s, { m =>
      Regex.quoteReplacement(envVars.get(m.group(1))
        .orElse(Option(m.group(2))).getOrElse(
          throw new IllegalArgumentException(
            s"undefined env_var '${m.group(1)}' with no default")))
    })
    s
  }

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

  /** QUALIFY shapes handled: `select <list> from <tbl> [where …]
    * qualify row_number()/rank()/dense_rank() OVER (...) <cmp> <int>`,
    * where <list> is `*` or an explicit parens-free column list
    * (aliases fine) and <cmp> is any of = <= < >= > != <>. Covers the
    * reference's top-1 filters (locations_clean.sql:83,89,95) plus
    * explicit-list top-k variants. Boundary (by design, documented):
    * the select list may not contain parenthesised expressions — the
    * parens-free guard is what makes the lazy select-list match unable
    * to span across an earlier qualify-less SELECT in the same
    * statement; the OVER clause allows one nesting level (e.g.
    * `order by coalesce(a, b)`). */
  private val qualifyRe: Regex =
    ("""(?is)select\s+(\*|[^()]+?)\s+from\s+(\w+)(?:\s+where\s+((?:(?!\bselect\b|\bqualify\b).)*?))?\s+qualify\s+""" +
     """((?:row_number|rank|dense_rank)\(\)\s*over\s*\((?:[^()]|\([^()]*\))*\))\s*(=|<=|<|>=|>|!=|<>)\s*(\d+)""").r

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
    // 8. QUALIFY <ranker>() over (…) <cmp> k — star or explicit list.
    // The explicit-list form aliases the ranked subquery AS the source
    // table name so qualified column references in the list keep
    // resolving; __rn never leaks (the outer list doesn't name it).
    s = qualifyRe.replaceAllIn(s, { m =>
      val list = m.group(1).trim
      val tbl = m.group(2)
      val where = Option(m.group(3)).map(w => s" where $w").getOrElse("")
      val pred = s"__rn ${m.group(5)} ${m.group(6)}"
      Regex.quoteReplacement(
        if (list == "*")
          s"select * except(__rn) from (select *, ${m.group(4)} as __rn " +
          s"from $tbl$where) where $pred"
        else
          s"select $list from (select *, ${m.group(4)} as __rn " +
          s"from $tbl$where) $tbl where $pred")
    })
    // 9. pin current_date for determinism
    currentDateOverride.foreach { d =>
      s = """(?i)\bcurrent_date\b""".r.replaceAllIn(s, s"DATE '$d'")
    }
    s
  }
}
