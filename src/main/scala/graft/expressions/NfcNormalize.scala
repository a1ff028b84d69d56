package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization over a string column — the first
  * cleaning step of a multilingual corpus pipeline: canonically
  * equivalent sequences ("e" + U+0301 vs the precomposed U+00E9) must
  * hash, fingerprint, shingle, and dedup identically, so
  * normalization has to run BEFORE every content-addressed operator.
  *
  * Why a custom Expression: Spark ships no normalizer function, and a
  * Scala UDF would break whole-stage codegen on what is by definition
  * the first full-corpus pass. This stays inside codegen
  * (`defineCodeGen` emitting one static call) and fast-paths the
  * already-normalized case — for ASCII corpora `isNormalized` is a
  * cheap scan and the input UTF8String is returned untouched, no
  * allocation.
  *
  * Cross-engine contract: java.text.Normalizer NFC ≡ DuckDB's
  * `nfc_normalize` (utf8proc) on the oracle-checked paths — asserted
  * per row by the q_nfc_normalize hash match.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def dataType: DataType = StringType

  // analysis-time rejection of non-string inputs: without the
  // constraint, SQL nfc_normalize(123) passes analysis and dies at
  // runtime with a ClassCastException inside eval/codegen
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Called from generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
