package graft.sql

/** Minimal Jinja template engine covering dbt's everyday statement
  * surface — the layer that lets [[DbtProject]] run a real dbt
  * checkout whose models use templating beyond `ref()`/`source()`
  * (reference shape: `/root/reference/macros/utils.sql:1-3` defines a
  * `{% macro %}`; `dbt_project.yml:8` declares `macro-paths`).
  *
  * Supported, deliberately small and documented (anything else fails
  * loudly — raw Jinja must never leak into SQL):
  *
  *  - statements: `{% if %}` / `{% elif %}` / `{% else %}` /
  *    `{% endif %}`, `{% for x in seq %}` … `{% endfor %}` (with the
  *    `loop.index/index0/first/last/length` object), `{% set x = e %}`,
  *    `{% macro name(params with defaults) %}` … `{% endmacro %}`;
  *  - expressions: string/int/bool/none literals, list literals,
  *    `or`/`and`/`not`, comparisons (`==` `!=` `<` `<=` `>` `>=`,
  *    `in`), `~` concatenation, integer `+ - *`, parentheses,
  *    attribute access, filters `|join |upper |lower |trim |length
  *    |default`;
  *  - calls: `var('n'[, default])`, `env_var('N'[, default])`,
  *    `range(n)`/`range(a, b)`, `config(...)` (kwargs captured,
  *    renders empty — dbt's in-model materialization override), any
  *    `{% macro %}` defined in the template or passed in from the
  *    project's macro files, and `ref()`/`source()` — which re-emit
  *    their tag text verbatim so DAG extraction and table resolution
  *    keep operating on rendered output downstream;
  *  - comments `{# … #}` and whitespace-control (`{%- -%}`,
  *    `{{- -}}`), with real stripping semantics.
  *
  * Deviations from Jinja proper, kept for dbt-compat and loudness:
  * an undefined `var()`/`env_var()` is falsy in conditions and never
  * equal to anything, but RENDERING it throws (dbt aborts the run);
  * the string "false"/"0"/"none" is falsy (dbt --vars arrive as
  * strings); undefined bare identifiers throw instead of rendering
  * empty.
  */
object Jinja {

  // ---------- values ----------
  sealed trait JV
  final case class JStr(s: String) extends JV
  final case class JInt(n: Long) extends JV
  final case class JBool(b: Boolean) extends JV
  final case class JList(xs: Seq[JV]) extends JV
  final case class JMap(m: Map[String, JV]) extends JV
  /** Verbatim passthrough: ref()/source() tags re-emitted for the
    * downstream translator / DAG extractor, and rendered macro
    * bodies (already-final text). */
  final case class JRaw(s: String) extends JV
  case object JNone extends JV
  /** An undefined var()/env_var(): falsy, unequal to everything,
    * loud error when rendered. */
  final case class JUndef(msg: String) extends JV

  private def truthy(v: JV): Boolean = v match {
    case JStr(s) => s.nonEmpty && s != "false" && s != "0" && s != "none"
    case JInt(n) => n != 0
    case JBool(b) => b
    case JList(xs) => xs.nonEmpty
    case JMap(m) => m.nonEmpty
    case JRaw(s) => s.nonEmpty
    case JNone => false
    case JUndef(_) => false
  }

  private def show(v: JV): String = v match {
    case JStr(s) => s
    case JInt(n) => n.toString
    case JBool(b) => if (b) "True" else "False"
    case JRaw(s) => s
    case JNone => "None"
    case JUndef(msg) => fail(msg)
    case other => fail(s"cannot render $other into SQL text")
  }

  private def jvEq(a: JV, b: JV): Boolean = (a, b) match {
    case (JUndef(_), _) | (_, JUndef(_)) => false
    case (JStr(x), JStr(y)) => x == y
    case (JInt(x), JInt(y)) => x == y
    case (JBool(x), JBool(y)) => x == y
    case (JStr(x), JInt(y)) => x == y.toString // dbt vars arrive as strings
    case (JInt(x), JStr(y)) => x.toString == y
    case (JNone, JNone) => true
    case (JList(x), JList(y)) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => jvEq(p, q) }
    case _ => false
  }

  private def asInt(v: JV, ctx: String): Long = v match {
    case JInt(n) => n
    case JStr(s) if s.matches("-?\\d+") => s.toLong
    case other => fail(s"$ctx needs an integer, got $other")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  // ---------- expression AST ----------
  sealed trait Expr
  private final case class Lit(v: JV) extends Expr
  private final case class Ident(name: String) extends Expr
  private final case class Attr(e: Expr, name: String) extends Expr
  private final case class ListLit(xs: Seq[Expr]) extends Expr
  private final case class Call(name: String, args: Seq[Expr],
      kwargs: Seq[(String, Expr)]) extends Expr
  private final case class FilterApp(e: Expr, name: String,
      args: Seq[Expr]) extends Expr
  private final case class Un(op: String, e: Expr) extends Expr
  private final case class Bin(op: String, l: Expr, r: Expr) extends Expr

  // ---------- template AST ----------
  sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Out(e: Expr) extends Node
  private final case class IfNode(branches: Seq[(Expr, Seq[Node])],
      els: Seq[Node]) extends Node
  private final case class ForNode(varName: String, iter: Expr,
      body: Seq[Node]) extends Node
  private final case class SetNode(name: String, e: Expr) extends Node
  private final case class SetBlockNode(name: String,
      body: Seq[Node]) extends Node
  final case class MacroDef(name: String,
      params: Seq[(String, Option[Expr])], body: Seq[Node])
  private final case class MacroNode(d: MacroDef) extends Node

  // ---------- expression lexer ----------
  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TNum(n: Long) extends Tok
  private final case class TOp(s: String) extends Tok

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < src.length) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val end = src.indexOf(c, i + 1)
        if (end < 0) fail(s"unterminated string in Jinja expression: $src")
        out += TStr(src.substring(i + 1, end)); i = end + 1
      } else if (c.isDigit) {
        val j = src.indexWhere(!_.isDigit, i) match { case -1 => src.length; case j => j }
        out += TNum(src.substring(i, j).toLong); i = j
      } else if (c.isLetter || c == '_') {
        val j = src.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i) match {
          case -1 => src.length; case j => j }
        out += TIdent(src.substring(i, j)); i = j
      } else {
        val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=").contains(two)) { out += TOp(two); i += 2 }
        else if ("()[],|.~+-*<>=".indexOf(c) >= 0) { out += TOp(c.toString); i += 1 }
        else fail(s"unsupported character '$c' in Jinja expression: $src")
      }
    }
    out.result()
  }

  // ---------- expression parser (recursive descent) ----------
  private final class P(val toks: Vector[Tok], src: String) {
    var pos = 0
    def peek: Option[Tok] = toks.lift(pos)
    def next(): Tok = { val t = toks.lift(pos).getOrElse(
      fail(s"unexpected end of Jinja expression: $src")); pos += 1; t }
    def eat(op: String): Boolean = peek match {
      case Some(TOp(`op`)) => pos += 1; true
      case _ => false
    }
    def expect(op: String): Unit =
      if (!eat(op)) fail(s"expected '$op' in Jinja expression: $src")

    def parseExpr(): Expr = parseOr()
    private def parseOr(): Expr = {
      var l = parseAnd()
      while (peek.contains(TIdent("or"))) { pos += 1; l = Bin("or", l, parseAnd()) }
      l
    }
    private def parseAnd(): Expr = {
      var l = parseNot()
      while (peek.contains(TIdent("and"))) { pos += 1; l = Bin("and", l, parseNot()) }
      l
    }
    private def parseNot(): Expr = peek match {
      case Some(TIdent("not")) => pos += 1; Un("not", parseNot())
      case _ => parseCmp()
    }
    private def parseCmp(): Expr = {
      val l = parseConcat()
      peek match {
        case Some(TOp(op)) if Set("==", "!=", "<", "<=", ">", ">=").contains(op) =>
          pos += 1; Bin(op, l, parseConcat())
        case Some(TIdent("in")) => pos += 1; Bin("in", l, parseConcat())
        case Some(TIdent("not")) if toks.lift(pos + 1).contains(TIdent("in")) =>
          pos += 2; Un("not", Bin("in", l, parseConcat()))
        case _ => l
      }
    }
    private def parseConcat(): Expr = {
      var l = parseAdd()
      while (eat("~")) l = Bin("~", l, parseAdd())
      l
    }
    private def parseAdd(): Expr = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case Some(TOp("+")) => pos += 1; l = Bin("+", l, parseMul())
        case Some(TOp("-")) => pos += 1; l = Bin("-", l, parseMul())
        case _ => go = false
      }
      l
    }
    private def parseMul(): Expr = {
      var l = parseUnary()
      while (eat("*")) l = Bin("*", l, parseUnary())
      l
    }
    private def parseUnary(): Expr =
      if (eat("-")) Un("neg", parseUnary()) else parsePostfix()

    private def parseCallArgs(): (Seq[Expr], Seq[(String, Expr)]) = {
      val args = Seq.newBuilder[Expr]
      val kwargs = Seq.newBuilder[(String, Expr)]
      if (!eat(")")) {
        var go = true
        while (go) {
          (peek, toks.lift(pos + 1)) match {
            case (Some(TIdent(k)), Some(TOp("="))) =>
              pos += 2; kwargs += (k -> parseExpr())
            case _ => args += parseExpr()
          }
          if (eat(")")) go = false else expect(",")
        }
      }
      (args.result(), kwargs.result())
    }

    private def parsePostfix(): Expr = {
      var e = parsePrimary()
      var go = true
      while (go) peek match {
        case Some(TOp(".")) =>
          pos += 1
          val name = next() match {
            case TIdent(n) => n
            case t => fail(s"expected attribute name after '.', got $t: $src")
          }
          if (eat("(")) e = e match {
            // namespaced call (dbt_utils.fn(...)) — only on a bare name
            case Ident(base) =>
              val (a, kw) = parseCallArgs(); Call(s"$base.$name", a, kw)
            case _ => fail(s"method calls are not supported: .$name(): $src")
          }
          else e = Attr(e, name)
        case Some(TOp("|")) =>
          pos += 1
          val name = next() match {
            case TIdent(n) => n
            case t => fail(s"expected filter name after '|', got $t: $src")
          }
          val args = if (eat("(")) {
            val (a, kw) = parseCallArgs()
            if (kw.nonEmpty) fail(s"filter kwargs not supported: $src")
            a
          } else Seq.empty
          e = FilterApp(e, name, args)
        case _ => go = false
      }
      e
    }

    private def parsePrimary(): Expr = next() match {
      case TStr(s) => Lit(JStr(s))
      case TNum(n) => Lit(JInt(n))
      case TIdent("true") | TIdent("True") => Lit(JBool(true))
      case TIdent("false") | TIdent("False") => Lit(JBool(false))
      case TIdent("none") | TIdent("None") => Lit(JNone)
      case TIdent(name) =>
        if (eat("(")) { val (a, kw) = parseCallArgs(); Call(name, a, kw) }
        else Ident(name)
      case TOp("(") => val e = parseExpr(); expect(")"); e
      case TOp("[") =>
        val xs = Seq.newBuilder[Expr]
        if (!eat("]")) {
          var go = true
          while (go) { xs += parseExpr(); if (eat("]")) go = false else expect(",") }
        }
        ListLit(xs.result())
      case t => fail(s"unexpected token $t in Jinja expression: $src")
    }
  }

  private def parseExprStr(src: String): Expr = {
    val p = new P(lex(src), src)
    val e = p.parseExpr()
    if (p.pos != p.toks.length)
      fail(s"trailing tokens in Jinja expression: $src")
    e
  }

  // ---------- template lexer ----------
  private sealed trait Seg
  private final case class TextSeg(s: String) extends Seg
  private final case class OutSeg(body: String) extends Seg
  private final case class StmtSeg(kw: String, rest: String) extends Seg

  private val tagRe =
    """(?s)\{\{-?(.*?)-?\}\}|\{%-?(.*?)-?%\}|\{#-?(.*?)-?#\}""".r

  /** Split the template into text/output/statement segments, applying
    * whitespace-control stripping (`{%-` eats whitespace to its left,
    * `-%}` to its right; likewise `{{- -}}` and `{#- -#}`). */
  private def segment(template: String): Vector[Seg] = {
    val out = Vector.newBuilder[Seg]
    var last = 0
    var pendingTrim = false // previous tag ended with '-'
    def emitText(upto: Int, trimLeft: Boolean): Unit = {
      var s = template.substring(last, upto)
      if (pendingTrim) s = s.replaceAll("^\\s+", "")
      if (trimLeft) s = s.replaceAll("\\s+$", "")
      if (s.nonEmpty) out += TextSeg(s)
    }
    for (m <- tagRe.findAllMatchIn(template)) {
      val whole = m.matched
      val isOut = whole.startsWith("{{")
      val isStmt = whole.startsWith("{%")
      val trimLeft = whole.length > 2 && whole.charAt(2) == '-'
      val trimRight = whole.charAt(whole.length - 3) == '-'
      emitText(m.start, trimLeft)
      last = m.end
      pendingTrim = trimRight
      if (isOut) out += OutSeg(m.group(1).trim)
      else if (isStmt) {
        val body = m.group(2).trim
        val sp = body.indexWhere(_.isWhitespace)
        val (kw, rest) =
          if (sp < 0) (body, "") else (body.substring(0, sp), body.substring(sp).trim)
        out += StmtSeg(kw, rest)
      }
      // comments: dropped entirely (trim flags already applied)
    }
    emitText(template.length, trimLeft = false)
    out.result()
  }

  // ---------- statement parser ----------
  /** Parse nodes until one of `enders` (statement keywords) or end of
    * input; returns (nodes, next index, ender kw or "", ender rest). */
  private def parseNodes(segs: Vector[Seg], start: Int,
      enders: Set[String]): (Seq[Node], Int, String, String) = {
    val out = Seq.newBuilder[Node]
    var i = start
    while (i < segs.length) {
      segs(i) match {
        case TextSeg(s) => out += Text(s); i += 1
        case OutSeg(b) => out += Out(parseExprStr(b)); i += 1
        case StmtSeg(kw, rest) if enders.contains(kw) =>
          return (out.result(), i + 1, kw, rest)
        case StmtSeg("if", cond) =>
          var branches = Seq((parseExprStr(cond), Seq.empty[Node]))
          var els = Seq.empty[Node]
          var j = i + 1
          var closed = false
          while (!closed) {
            val (body, nj, ender, erest) =
              parseNodes(segs, j, Set("elif", "else", "endif"))
            branches = branches.init :+ (branches.last._1 -> body)
            j = nj
            ender match {
              case "elif" => branches :+= (parseExprStr(erest) -> Seq.empty[Node])
              case "else" =>
                val (ebody, nk, e2, _) = parseNodes(segs, j, Set("endif"))
                if (e2 != "endif") fail("{% else %} without {% endif %}")
                els = ebody; j = nk; closed = true
              case "endif" => closed = true
              case _ => fail("unbalanced {% if %}: missing {% endif %}")
            }
          }
          out += IfNode(branches, els); i = j
        case StmtSeg("for", rest) =>
          val forRe = """(?s)^(\w+)\s+in\s+(.*)$""".r
          rest match {
            case forRe(v, iter) =>
              val (body, nj, ender, _) = parseNodes(segs, i + 1, Set("endfor"))
              if (ender != "endfor") fail("unbalanced {% for %}: missing {% endfor %}")
              out += ForNode(v, parseExprStr(iter), body); i = nj
            case other => fail(s"unsupported {% for %} form: $other " +
              "(only `for name in expr`; tuple unpacking is not supported)")
          }
        case StmtSeg("set", rest) =>
          val setRe = """(?s)^(\w+)\s*=\s*(.*)$""".r
          rest match {
            case setRe(n, e) => out += SetNode(n, parseExprStr(e)); i += 1
            case n if n.matches("\\w+") =>
              // block form: {% set name %} body {% endset %} — the
              // rendered body binds as a string
              val (body, nj, ender, _) = parseNodes(segs, i + 1, Set("endset"))
              if (ender != "endset")
                fail("unbalanced {% set %}: missing {% endset %}")
              out += SetBlockNode(n, body); i = nj
            case other => fail(s"unsupported {% set %} form: $other")
          }
        case StmtSeg("macro", rest) =>
          val macRe = """(?s)^(\w+)\s*\((.*)\)\s*$""".r
          rest match {
            case macRe(name, paramSrc) =>
              val params =
                if (paramSrc.trim.isEmpty) Seq.empty
                else paramSrc.split(",").toSeq.map { p =>
                  val parts = p.split("=", 2)
                  val n = parts(0).trim
                  if (!n.matches("\\w+")) fail(s"bad macro parameter '$n' in $rest")
                  n -> parts.lift(1).map(d => parseExprStr(d.trim))
                }
              val (body, nj, ender, _) = parseNodes(segs, i + 1, Set("endmacro"))
              if (ender != "endmacro")
                fail("unbalanced {% macro %}: missing {% endmacro %}")
              out += MacroNode(MacroDef(name, params, body)); i = nj
            case other => fail(s"unsupported {% macro %} form: $other")
          }
        case StmtSeg(kw, _) =>
          fail(s"unsupported or unbalanced Jinja statement block: {% $kw %}")
      }
    }
    (out.result(), i, "", "")
  }

  // ---------- evaluation ----------
  private final class Ctx(
      val vars: Map[String, String],
      val envVars: Map[String, String],
      val macros: scala.collection.mutable.Map[String, MacroDef],
      val config: scala.collection.mutable.Map[String, String],
      var scope: List[scala.collection.mutable.Map[String, JV]],
      val builtins: Map[String, Seq[JV] => JV],
      // list-valued config kwargs, items preserved (the flat `config`
      // map comma-joins them, which is lossy for SQL-bearing lists
      // like post_hook=[...])
      val configLists: scala.collection.mutable.Map[String, Seq[String]] =
        scala.collection.mutable.Map.empty)

  private def lookup(ctx: Ctx, name: String): Option[JV] =
    ctx.scope.collectFirst { case f if f.contains(name) => f(name) }

  private def evalExpr(e: Expr, ctx: Ctx): JV = e match {
    case Lit(v) => v
    case ListLit(xs) => JList(xs.map(evalExpr(_, ctx)))
    case Ident(n) => lookup(ctx, n).getOrElse(
      fail(s"undefined Jinja identifier '$n'"))
    case Attr(b, n) => evalExpr(b, ctx) match {
      case JMap(m) => m.getOrElse(n, fail(s"no attribute '$n'"))
      case other => fail(s"cannot access attribute '$n' of $other")
    }
    case Un("not", x) => JBool(!truthy(evalExpr(x, ctx)))
    case Un("neg", x) => JInt(-asInt(evalExpr(x, ctx), "unary -"))
    case Un(op, _) => fail(s"unsupported unary op $op")
    case Bin("or", l, r) =>
      val lv = evalExpr(l, ctx); if (truthy(lv)) lv else evalExpr(r, ctx)
    case Bin("and", l, r) =>
      val lv = evalExpr(l, ctx); if (!truthy(lv)) lv else evalExpr(r, ctx)
    case Bin("==", l, r) => JBool(jvEq(evalExpr(l, ctx), evalExpr(r, ctx)))
    case Bin("!=", l, r) => JBool(!jvEq(evalExpr(l, ctx), evalExpr(r, ctx)))
    case Bin(op @ ("<" | "<=" | ">" | ">="), l, r) =>
      val a = asInt(evalExpr(l, ctx), op); val b = asInt(evalExpr(r, ctx), op)
      JBool(op match {
        case "<" => a < b; case "<=" => a <= b
        case ">" => a > b; case ">=" => a >= b
      })
    case Bin("in", l, r) => (evalExpr(l, ctx), evalExpr(r, ctx)) match {
      case (x, JList(xs)) => JBool(xs.exists(jvEq(_, x)))
      case (JStr(a), JStr(b)) => JBool(b.contains(a))
      case (x, y) => fail(s"unsupported 'in' operands: $x in $y")
    }
    case Bin("~", l, r) => JStr(show(evalExpr(l, ctx)) + show(evalExpr(r, ctx)))
    case Bin(op @ ("+" | "-" | "*"), l, r) =>
      val a = asInt(evalExpr(l, ctx), op); val b = asInt(evalExpr(r, ctx), op)
      JInt(op match { case "+" => a + b; case "-" => a - b; case "*" => a * b })
    case Bin(op, _, _) => fail(s"unsupported operator $op")
    case FilterApp(b, name, args) =>
      val v = evalExpr(b, ctx)
      val as = args.map(evalExpr(_, ctx))
      (name, v) match {
        case ("join", JList(xs)) =>
          val sep = as.headOption.map(show).getOrElse("")
          JStr(xs.map(show).mkString(sep))
        case ("upper", x) => JStr(show(x).toUpperCase)
        case ("lower", x) => JStr(show(x).toLowerCase)
        case ("trim", x) => JStr(show(x).trim)
        case ("length", JList(xs)) => JInt(xs.length.toLong)
        case ("length", JStr(s)) => JInt(s.length.toLong)
        case ("default", x) =>
          val d = as.headOption.getOrElse(fail("default filter needs an argument"))
          x match { case JUndef(_) | JNone => d; case other => other }
        case (n, x) => fail(s"unsupported filter |$n on $x")
      }
    case Call(name, args, kwargs) => evalCall(name, args, kwargs, ctx)
  }

  private def evalCall(name: String, argEs: Seq[Expr],
      kwargEs: Seq[(String, Expr)], ctx: Ctx): JV = {
    def args = argEs.map(evalExpr(_, ctx))
    def strArg(i: Int, what: String): String = argEs.lift(i) match {
      case Some(e) => show(evalExpr(e, ctx))
      case None => fail(s"$what needs argument ${i + 1}")
    }
    name match {
      case "var" =>
        val n = strArg(0, "var()")
        ctx.vars.get(n).map(JStr(_)).getOrElse {
          if (argEs.length > 1) evalExpr(argEs(1), ctx)
          else JUndef(s"undefined var '$n' with no default")
        }
      case "env_var" =>
        val n = strArg(0, "env_var()")
        ctx.envVars.get(n).map(JStr(_)).getOrElse {
          if (argEs.length > 1) evalExpr(argEs(1), ctx)
          else JUndef(s"undefined env_var '$n' with no default")
        }
      case "ref" =>
        // versioned refs (ref('m', v=2)) are resolved to concrete
        // relation names by DbtProject.load BEFORE rendering; a
        // multi-arg ref surviving to here would otherwise silently
        // drop its version and read the wrong relation
        if (argEs.length > 1 || kwargEs.nonEmpty)
          fail("ref() with a version (or extra args) must resolve at " +
            "project load — is the model declared under `versions:` " +
            "in a schema yml?")
        JRaw(s"{{ ref('${strArg(0, "ref()")}') }}")
      case "source" =>
        JRaw(s"{{ source('${strArg(0, "source()")}', '${strArg(1, "source()")}') }}")
      case "config" =>
        kwargEs.foreach { case (k, e) =>
          ctx.config(k) = evalExpr(e, ctx) match {
            // list-valued config (unique_key=['a','b']) folds to a
            // comma-joined string — the capture map stays flat; the
            // items also land in configLists verbatim for consumers
            // whose values may themselves contain commas (hooks)
            case JList(xs) =>
              val items = xs.map(show)
              ctx.configLists(k) = items
              items.mkString(",")
            case v => show(v)
          }
        }
        JStr("")
      case "range" => args match {
        case Seq(JInt(n)) => JList((0L until n).map(JInt(_)))
        case Seq(a, b) =>
          JList((asInt(a, "range") until asInt(b, "range")).map(JInt(_)))
        case _ => fail("range() takes 1 or 2 integer arguments")
      }
      case n if ctx.builtins.contains(n) => ctx.builtins(n)(args)
      case n if ctx.macros.contains(n) =>
        val d = ctx.macros(n)
        if (args.length > d.params.length)
          fail(s"macro ${d.name} takes ${d.params.length} args, got ${args.length}")
        val kw = kwargEs.map { case (k, e) => k -> evalExpr(e, ctx) }.toMap
        val frame = scala.collection.mutable.Map.empty[String, JV]
        d.params.zipWithIndex.foreach { case ((pn, dflt), i) =>
          frame(pn) = args.lift(i).orElse(kw.get(pn))
            .orElse(dflt.map(evalExpr(_, ctx)))
            .getOrElse(fail(s"macro ${d.name}: missing argument '$pn'"))
        }
        val saved = ctx.scope
        ctx.scope = frame :: ctx.scope
        val sb = new StringBuilder
        try evalNodes(d.body, ctx, sb) finally ctx.scope = saved
        JRaw(sb.toString)
      case other => fail(s"unsupported Jinja function '$other'")
    }
  }

  private def evalNodes(nodes: Seq[Node], ctx: Ctx, sb: StringBuilder): Unit =
    nodes.foreach {
      case Text(s) => sb.append(s)
      case Out(e) => sb.append(show(evalExpr(e, ctx)))
      case SetNode(n, e) => ctx.scope.head(n) = evalExpr(e, ctx)
      case SetBlockNode(n, body) =>
        val inner = new StringBuilder
        evalNodes(body, ctx, inner)
        ctx.scope.head(n) = JStr(inner.toString)
      case MacroNode(d) => ctx.macros(d.name) = d
      case IfNode(branches, els) =>
        branches.find { case (c, _) => truthy(evalExpr(c, ctx)) } match {
          case Some((_, body)) => evalNodes(body, ctx, sb)
          case None => evalNodes(els, ctx, sb)
        }
      case ForNode(v, iterE, body) =>
        val xs = evalExpr(iterE, ctx) match {
          case JList(items) => items
          case JStr(s) => s.map(c => JStr(c.toString))
          case other => fail(s"cannot iterate over $other in {% for %}")
        }
        val n = xs.length
        xs.zipWithIndex.foreach { case (item, i) =>
          val frame = scala.collection.mutable.Map[String, JV](
            v -> item,
            "loop" -> JMap(Map(
              "index" -> JInt(i + 1L), "index0" -> JInt(i.toLong),
              "first" -> JBool(i == 0), "last" -> JBool(i == n - 1),
              "length" -> JInt(n.toLong))))
          val saved = ctx.scope
          ctx.scope = frame :: ctx.scope
          try evalNodes(body, ctx, sb) finally ctx.scope = saved
        }
    }

  // ---------- public API ----------
  /** A rendered template plus any `config(...)` kwargs it declared.
    * `configList` carries list-valued kwargs with their items intact
    * (the flat `config` comma-joins them, lossy for SQL-bearing
    * lists like `post_hook=[...]`). */
  final case class Result(text: String, config: Map[String, String],
      configList: Map[String, Seq[String]] = Map.empty)

  /** @param bindings extra root-scope identifiers (e.g. dbt's
    *        `this` → the target relation as a [[JRaw]])
    * @param builtins extra zero-config functions (e.g. dbt's
    *        `is_incremental()`), consulted before the unsupported-
    *        function error */
  def render(template: String, vars: Map[String, String] = Map.empty,
      envVars: Map[String, String] = sys.env,
      macros: Map[String, MacroDef] = Map.empty,
      bindings: Map[String, JV] = Map.empty,
      builtins: Map[String, Seq[JV] => JV] = Map.empty): Result = {
    val (nodes, _, ender, _) = parseNodes(segment(template), 0, Set.empty)
    if (ender.nonEmpty) fail(s"unexpected {% $ender %}")
    val ctx = new Ctx(vars, envVars,
      scala.collection.mutable.Map.from(macros),
      scala.collection.mutable.Map.empty,
      List(scala.collection.mutable.Map.from(bindings)), builtins)
    val sb = new StringBuilder
    evalNodes(nodes, ctx, sb)
    Result(sb.toString, ctx.config.toMap, ctx.configLists.toMap)
  }

  /** Parse a macro file (dbt `macro-paths` entry): every top-level
    * `{% macro %}` definition, keyed by name. Non-whitespace text
    * outside macro definitions fails loudly. */
  def parseMacros(src: String): Map[String, MacroDef] = {
    val (nodes, _, ender, _) = parseNodes(segment(src), 0, Set.empty)
    if (ender.nonEmpty) fail(s"unexpected {% $ender %} in macro file")
    nodes.flatMap {
      case MacroNode(d) => Seq(d.name -> d)
      case Text(s) if s.trim.isEmpty => Seq.empty
      case other => fail(s"macro files may only contain {% macro %} blocks, got $other")
    }.toMap
  }
}
