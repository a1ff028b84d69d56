package graft.sql

/** Minimal indentation-structured YAML-subset parser — the shape dbt
  * schema files actually use (block maps, block lists, `- key: value`
  * list-item maps, inline flow lists `[a, b]`, quoted scalars,
  * comments). Deliberately NOT a YAML library: anchors, multi-docs,
  * flow maps, multi-line scalars are out of scope and fail loudly or
  * parse as plain scalars where harmless. Used by [[DbtProject]] for
  * the `tests:` surface of schema ymls (`marts_schema.yml:6-15`),
  * where the ad-hoc line walkers that cover `sources:` /
  * `dbt_project.yml` would not scale to the nesting.
  */
object MiniYaml {

  sealed trait Node
  final case class YMap(entries: Vector[(String, Node)]) extends Node {
    def get(key: String): Option[Node] =
      entries.collectFirst { case (k, v) if k == key => v }
  }
  final case class YList(items: Vector[Node]) extends Node
  final case class YScalar(value: String) extends Node
  case object YNull extends Node

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Split `s` on commas at nesting depth 0 (quotes and [] {}
    * respected) — the flow-collection item separator. */
  private def splitTop(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0; var start = 0; var depth = 0; var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else c match {
        case '\'' | '"' => q = c
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** Inline value: flow list, flow map (`{id: 1, v: a}` — the dbt
    * unit-test fixture-row shape), quoted scalar, or plain scalar.
    * A `{{ jinja }}` expression is NOT a flow map — it stays a
    * scalar for the layers that render it. */
  private def inline(v: String): Node = {
    val t = v.trim
    if (t.isEmpty) YNull
    else if (t.startsWith("[") && t.endsWith("]")) {
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) YList(Vector.empty)
      else YList(splitTop(body).map(x => inline(x)))
    } else if (t.startsWith("{") && !t.startsWith("{{") && t.endsWith("}")) {
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) YMap(Vector.empty)
      else YMap(splitTop(body).map { kv =>
        keySplit(kv.trim) match {
          case Some((k, rest)) => k -> inline(rest)
          case None => throw new IllegalArgumentException(
            s"flow map entry without 'key: value' shape: '$kv'")
        }
      })
    } else YScalar(unquote(t))
  }

  /** `key: rest` split at the first colon NOT inside quotes/brackets;
    * None when the line is not a mapping entry. */
  private def keySplit(s: String): Option[(String, String)] = {
    var i = 0; var depth = 0; var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else c match {
        case '\'' | '"' => q = c
        case '[' | '{' => depth += 1
        case ']' | '}' => depth -= 1
        case ':' if depth == 0 &&
            (i + 1 == s.length || s.charAt(i + 1) == ' ') =>
          return Some((unquote(s.substring(0, i)), s.substring(i + 1)))
        case _ => ()
      }
      i += 1
    }
    None
  }

  /** Parse a document into its root node. Lines are (indent, text)
    * with blanks/comments dropped; tabs count as two spaces. */
  def parse(text: String): Node = {
    val lines = text.linesIterator
      .map(_.replace("\t", "  "))
      .map(l => {
        val noComment =
          // strip full-line comments only; inline '#' inside quoted
          // strings is rare in dbt ymls and a trailing comment after a
          // scalar would change its value — keep those verbatim
          if (l.trim.startsWith("#")) "" else l
        noComment
      })
      .filter(_.trim.nonEmpty)
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))
      .toVector
    if (lines.isEmpty) YNull else parseBlock(lines)._1
  }

  /** Parse the whole `lines` region as one node (the region is
    * pre-sliced by the caller to a single block). */
  private def parseBlock(lines: Vector[(Int, String)]): (Node, Int) = {
    val base = lines.head._1
    if (lines.head._2.startsWith("- ") || lines.head._2 == "-") parseList(lines, base)
    else parseMap(lines, base)
  }

  private def sliceItem(lines: Vector[(Int, String)], start: Int,
      indent: Int): Int = {
    // exclusive end of the region belonging to the entry at `start`
    var j = start + 1
    while (j < lines.length && lines(j)._1 > indent) j += 1
    j
  }

  private def parseList(lines: Vector[(Int, String)], indent: Int): (Node, Int) = {
    val items = Vector.newBuilder[Node]
    var i = 0
    while (i < lines.length && lines(i)._1 == indent &&
        (lines(i)._2.startsWith("- ") || lines(i)._2 == "-")) {
      val end = sliceItem(lines, i, indent)
      val rest = lines(i)._2.drop(1).trim
      val tail = lines.slice(i + 1, end)
      if (rest.isEmpty) {
        items += (if (tail.isEmpty) YNull else parseBlock(tail)._1)
      } else {
        // virtual line: the item's inline content re-indented past the
        // dash, then the item's continuation lines
        val virt = (indent + 2, rest) +: tail
        keySplit(rest) match {
          case Some(_) => items += parseMap(virt, indent + 2)._1
          case None =>
            if (tail.nonEmpty) throw new IllegalArgumentException(
              s"scalar list item with nested block: '$rest'")
            items += inline(rest)
        }
      }
      i = end
    }
    if (i != lines.length) throw new IllegalArgumentException(
      s"unparsed lines after list at indent $indent: ${lines(i)}")
    (YList(items.result()), lines.length)
  }

  private def parseMap(lines: Vector[(Int, String)], indent: Int): (Node, Int) = {
    val entries = Vector.newBuilder[(String, Node)]
    var i = 0
    while (i < lines.length) {
      val (ind, txt) = lines(i)
      if (ind != indent) throw new IllegalArgumentException(
        s"bad indent $ind (expected $indent) at: $txt")
      val (k, rest) = keySplit(txt).getOrElse(throw new IllegalArgumentException(
        s"expected 'key:' line at indent $indent, got: $txt"))
      val end = sliceItem(lines, i, indent)
      val tail = lines.slice(i + 1, end)
      if (rest.trim.nonEmpty) {
        if (tail.nonEmpty) throw new IllegalArgumentException(
          s"inline value with nested block under '$k'")
        entries += (k -> inline(rest))
      } else {
        entries += (k -> (if (tail.isEmpty) YNull else parseBlock(tail)._1))
      }
      i = end
    }
    (YMap(entries.result()), lines.length)
  }
}
