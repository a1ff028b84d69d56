package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990) as a native
  * codegen'd Expression — the name comparator record linkage was
  * built on: edit distance treats "martha"/"marhta" (a transposition)
  * as two edits, Jaro scores it 0.944 and Winkler's common-prefix
  * bonus lifts it to 0.961. Complements levenshtein in
  * [[graft.ext.EntityResolution]]: a SIMILARITY in [0,1] rather than
  * an edit count, so thresholds transfer across name lengths.
  *
  * Why a custom Expression: Spark ships no Jaro–Winkler; a UDF would
  * break whole-stage codegen inside the ER pairwise stage — the one
  * hot loop of a record-linkage run. `defineCodeGen` emits a single
  * static call.
  *
  * Cross-engine contract: the textbook algorithm (match window
  * ⌊max/2⌋−1, transpositions halved, prefix bonus l≤4 · 0.1 · (1−j)
  * applied above the 0.7 boost threshold, both-empty → 0) in fixed
  * evaluation order — verified value-identical to DuckDB's
  * `jaro_winkler_similarity` (micro-rounded per row) by the
  * q_jaro_winkler hash match. Operates on UTF-8 BYTES, which is what
  * DuckDB's implementation walks (probed: 'éa' vs 'éb' scores as the
  * 3-byte strings, not the 2-codepoint ones); on ASCII bytes ≡
  * characters, and the convention is harmless for a comparator as
  * long as both sides share it.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType

  override def inputTypes = Seq(StringType, StringType)

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Called from generated code. */
  def similarity(ls: UTF8String, rs: UTF8String): Double = {
    // UTF-8 bytes — the unit DuckDB's comparator walks (see scaladoc)
    val a = ls.getBytes
    val b = rs.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0 // incl. both-empty, as DuckDB
    if (java.util.Arrays.equals(a, b)) return 1.0
    val win = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb, i + win + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val j = (md / la + md / lb + (md - t) / md) / 3.0
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Column-API entry point. */
  def jw(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
