package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit portable md5 hash over a string column.
  *
  * Semantics: bit-identical to
  * `conv(substring(md5(c), 1, 15), 16, 10) :: long` — the value of the
  * first 15 hex chars of the digest — which is the cross-engine hash
  * contract shared with the DuckDB oracles
  * (`CAST(concat('0x', substr(md5(c), 1, 15)) AS BIGINT)`). With
  * `second = true` it instead reads hex chars 16–30 (the digest's
  * second independent 60-bit half, used by MinHash to get two seed
  * hashes per digest).
  *
  * Why a custom Expression: the composed form materializes a 32-char
  * hex STRING per row, substrings it, and re-parses the hex back to a
  * long (`Conv` does per-char division) — three string allocations on
  * the hottest map-side path of the engine (MinHash seed hashes, LSH,
  * CDC boundaries, hash splits all run it per token/shingle). This
  * expression reads the 60 bits straight out of the digest bytes
  * inside whole-stage codegen. Bit-equality with the composed form is
  * asserted in ExtSpec, so it is safe on oracle-checked paths.
  */
case class Md5Hash60(child: Expression, second: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String], second)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5Hash60.hash($c, $second)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First (hex chars 1–15) or second (16–30) 60-bit half of
    * md5(UTF-8 bytes of s). Called from generated code. */
  def hash(s: UTF8String, second: Boolean): Long = {
    val d = digests.get().digest(s.getBytes)
    var v = 0L
    if (second) {
      // low nibble of byte 7, then bytes 8..14
      v = (d(7) & 0xfL)
      var i = 8
      while (i < 15) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    } else {
      // bytes 0..6, then high nibble of byte 7
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
    }
    v
  }

  /** Column-API entry point (string column → 60-bit long). */
  def hash60(c: Column, second: Boolean = false): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c), second))
}
