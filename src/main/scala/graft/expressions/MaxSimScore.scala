package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native ColBERT MaxSim score over two array<double> vectors read as
  * `nTokens` fixed-width `tokenDim` sub-vectors:
  * Σ_i max_j cos(q_i, d_j), zero-norm tokens scoring 0.
  *
  * Why a custom Expression: composed per-token slices + greatest of
  * nTokens² guarded cosines builds a ~500-node expression tree that
  * the interpreter walks per PAIR (measured ~0.3 ms/pair — the whole
  * per-pair score should be ~1 µs). Late interaction is a reranking
  * hot loop (queries × corpus invocations at serving time), so it
  * gets the DotProduct treatment: one fused generated loop, zero
  * per-pair allocation beyond a tokens-sized norm scratch.
  *
  * Exactness contract (oracle-replayable): per-token norms are
  * sqrt of the left-to-right self-dot; each cosine is one IEEE
  * division dot/(qnᵢ·dnⱼ) with a `== 0` guard; max over j is plain
  * double max (no NaN inputs by the guard); the i-sum is
  * left-to-right. Bit-identical to the slice/greatest/when built-in
  * composition (asserted in ExtSpec) and to the generated DuckDB
  * replay. Null input arrays, arrays SHORTER than
  * nTokens·tokenDim (which the fused loops would otherwise read
  * past), and arrays containing null ELEMENTS (which getDouble would
  * silently read as 0.0) all yield null, never garbage — matching
  * the composed slice/greatest reference's null propagation.
  */
case class MaxSimScore(left: Expression, right: Expression,
    nTokens: Int, tokenDim: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // nullable regardless of children: undersized vectors yield NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]; val d = b.asInstanceOf[ArrayData]
    // undersized vectors yield NULL, not garbage: the fused loops
    // index nTokens·tokenDim elements and ArrayData.getDouble does
    // not bounds-check on the unsafe path
    if (q.numElements() < nTokens * tokenDim ||
        d.numElements() < nTokens * tokenDim) return null
    // null ELEMENTS also yield null (matching the composed
    // slice/greatest reference, where a null element propagates):
    // ArrayData.getDouble would silently read 0.0 / undefined bytes
    // for a null slot. One O(n) flag pass — negligible next to the
    // O(nTokens^2 * tokenDim) scoring loops. (ADVICE r11)
    var chk = 0
    val need = nTokens * tokenDim
    while (chk < need) {
      if (q.isNullAt(chk) || d.isNullAt(chk)) return null
      chk += 1
    }
    val dn = new Array[Double](nTokens)
    var j = 0
    while (j < nTokens) {
      var s = 0.0; var t = 0; val off = j * tokenDim
      while (t < tokenDim) { val v = d.getDouble(off + t); s += v * v; t += 1 }
      dn(j) = math.sqrt(s); j += 1
    }
    var score = 0.0; var i = 0
    while (i < nTokens) {
      val qo = i * tokenDim
      var qs = 0.0; var t = 0
      while (t < tokenDim) { val v = q.getDouble(qo + t); qs += v * v; t += 1 }
      val qn = math.sqrt(qs)
      var best = 0.0; var first = true
      j = 0
      while (j < nTokens) {
        val den = qn * dn(j)
        var term = 0.0
        if (den != 0.0) {
          var dp = 0.0; var u = 0; val dof = j * tokenDim
          while (u < tokenDim) { dp += q.getDouble(qo + u) * d.getDouble(dof + u); u += 1 }
          term = dp / den
        }
        if (first || term > best) { best = term; first = false }
        j += 1
      }
      score += best; i += 1
    }
    score
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dn = ctx.freshName("dn"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val s = ctx.freshName("s"); val qn = ctx.freshName("qn")
      val best = ctx.freshName("best"); val score = ctx.freshName("score")
      val den = ctx.freshName("den"); val dp = ctx.freshName("dp")
      val v = ctx.freshName("v"); val qo = ctx.freshName("qo")
      val dof = ctx.freshName("dof"); val first = ctx.freshName("first")
      val term = ctx.freshName("term")
      val nullEl = ctx.freshName("nullEl")
      s"""
         |boolean ${nullEl} = $a.numElements() < ${nTokens * tokenDim} ||
         |    $b.numElements() < ${nTokens * tokenDim};
         |for (int $t = 0; !${nullEl} && $t < ${nTokens * tokenDim}; $t++) {
         |  ${nullEl} = $a.isNullAt($t) || $b.isNullAt($t);
         |}
         |if (${nullEl}) {
         |  ${ev.isNull} = true;
         |} else {
         |double[] $dn = new double[$nTokens];
         |for (int $j = 0; $j < $nTokens; $j++) {
         |  double $s = 0.0;
         |  for (int $t = 0; $t < $tokenDim; $t++) {
         |    double $v = $b.getDouble($j * $tokenDim + $t); $s += $v * $v;
         |  }
         |  $dn[$j] = java.lang.Math.sqrt($s);
         |}
         |double $score = 0.0;
         |for (int $i = 0; $i < $nTokens; $i++) {
         |  int $qo = $i * $tokenDim;
         |  double $s = 0.0;
         |  for (int $t = 0; $t < $tokenDim; $t++) {
         |    double $v = $a.getDouble($qo + $t); $s += $v * $v;
         |  }
         |  double $qn = java.lang.Math.sqrt($s);
         |  double $best = 0.0; boolean $first = true;
         |  for (int $j = 0; $j < $nTokens; $j++) {
         |    double $den = $qn * $dn[$j];
         |    double $term = 0.0;
         |    if ($den != 0.0) {
         |      double $dp = 0.0; int $dof = $j * $tokenDim;
         |      for (int $t = 0; $t < $tokenDim; $t++) {
         |        $dp += $a.getDouble($qo + $t) * $b.getDouble($dof + $t);
         |      }
         |      $term = $dp / $den;
         |    }
         |    if ($first || $term > $best) { $best = $term; $first = false; }
         |  }
         |  $score += $best;
         |}
         |${ev.value} = $score;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimScore =
    copy(left = newLeft, right = newRight)
}

object MaxSimScore {
  /** Column-API entry point (callers pass array<double> columns). */
  def maxSim(q: Column, d: Column, nTokens: Int, tokenDim: Int): Column =
    ColumnBridge.column(MaxSimScore(
      ColumnBridge.expression(q), ColumnBridge.expression(d), nTokens, tokenDim))
}
