package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search (Aho–Corasick 1975) as a native
  * Expression: one pass over the text finds ALL blocklist terms at
  * once, O(bytes + matches) regardless of how many patterns the list
  * holds. The naive alternative — `terms.map(contains(text, _))` — is
  * O(bytes × patterns) per row; at a C4-style badwords list (~1.6k
  * terms) over 100 TB of text that is a ~1000× difference on the
  * single hottest scan of a curation run.
  *
  * Returns the DISTINCT matched patterns in pattern-list order (empty
  * array when nothing matches, null text → null), so the blocklist
  * GATE (`size(...) = 0`), the AUDIT (which terms fired), and the
  * SCORER (how many) all read off one automaton pass.
  *
  * Matching is over UTF-8 bytes, case-sensitive: callers lowercase
  * text and patterns on the way in (the oracle does the same), which
  * keeps the automaton byte-exact across engines. The automaton is
  * built once per executor from the pattern list (a dense
  * byte-indexed DFA: nodes × 256 ints — a few MB for real blocklists)
  * and embedded in generated code via `addReferenceObj`, so the scan
  * stays inside whole-stage codegen.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "MultiMatch needs a non-empty list of non-empty patterns")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def inputTypes = Seq(StringType)

  @transient private lazy val automaton = AhoCorasick.build(patterns)

  override def nullSafeEval(t: Any): Any =
    automaton.scan(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("ac", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$ac.scan($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {
  def matchedTerms(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiMatch(ColumnBridge.expression(text), patterns))
}

/** Dense-DFA Aho–Corasick automaton. Built on the driver (or lazily
  * per executor after serialization), immutable thereafter: `next` is
  * the goto function with fail links pre-folded in (so the scan loop
  * is a single array read per input byte), `outputs` the fail-chain-
  * merged set of pattern indices ending at each node.
  */
final class AhoCorasick private (
    next: Array[Array[Int]],
    outputs: Array[Array[Int]],
    patterns: Array[UTF8String]) extends Serializable {

  /** Called from generated code. One pass; collects distinct matched
    * patterns in pattern-list order. */
  def scan(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val hit = new Array[Boolean](patterns.length)
    var nHits = 0
    var s = 0
    var i = 0
    while (i < bytes.length && nHits < patterns.length) {
      s = next(s)(bytes(i) & 0xff)
      val out = outputs(s)
      var j = 0
      while (j < out.length) {
        if (!hit(out(j))) { hit(out(j)) = true; nHits += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Any](nHits)
    var k = 0
    var p = 0
    while (p < patterns.length) {
      if (hit(p)) { res(k) = patterns(p); k += 1 }
      p += 1
    }
    new GenericArrayData(res)
  }
}

object AhoCorasick {

  /** Classic construction: byte trie, BFS fail links, then fold the
    * fail function into `next` (full DFA) and merge each node's
    * output set with its fail target's. Duplicate patterns collapse
    * to the first occurrence. */
  def build(patternsIn: Seq[String]): AhoCorasick = {
    val patterns = patternsIn.distinct.toArray
    val pats = patterns.map(p => p.getBytes("UTF-8"))
    // trie over bytes
    var cap = 16
    var nodes = 1
    var goto = Array.fill(cap)(null: Array[Int])
    goto(0) = Array.fill(256)(-1)
    val ends = scala.collection.mutable.Map.empty[Int, List[Int]]
        .withDefaultValue(Nil)
    for (pi <- pats.indices) {
      var s = 0
      for (b <- pats(pi)) {
        val c = b & 0xff
        if (goto(s)(c) == -1) {
          if (nodes == cap) {
            cap *= 2
            goto = java.util.Arrays.copyOf(goto, cap)
          }
          goto(nodes) = Array.fill(256)(-1)
          goto(s)(c) = nodes
          nodes += 1
        }
        s = goto(s)(c)
      }
      ends(s) = pi :: ends(s)
    }
    // BFS fail links; fold fails into goto to get the dense DFA
    val fail = new Array[Int](nodes)
    val out = Array.fill(nodes)(List.empty[Int])
    for (s <- 0 until nodes) out(s) = ends(s)
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      val t = goto(0)(c)
      if (t == -1) goto(0)(c) = 0
      else { fail(t) = 0; queue += t }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s))
      for (c <- 0 until 256) {
        val t = goto(s)(c)
        if (t == -1) goto(s)(c) = goto(fail(s))(c)
        else { fail(t) = goto(fail(s))(c); queue += t }
      }
    }
    new AhoCorasick(
      goto.take(nodes),
      out.map(_.distinct.sorted.toArray).take(nodes),
      patterns.map(UTF8String.fromString))
  }
}
