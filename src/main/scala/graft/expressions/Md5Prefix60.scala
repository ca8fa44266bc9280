package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of md5 as an int64 — numerically identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` (and to DuckDB's
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) but computed
  * directly from the digest bytes: no 32-char hex string, no base-16
  * string parse, no per-row allocations beyond the digest itself.
  * This sits under every minhash signature (one call per shingle), so
  * the constant factor matters.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects string/binary, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Md5Prefix60.compute(s.getBytes)
    case b: Array[Byte] => Md5Prefix60.compute(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case BinaryType => s"graft.expressions.Md5Prefix60.compute($c)"
      case _ => s"graft.expressions.Md5Prefix60.compute($c.getBytes())"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 15 hex chars = md5 bytes 0..6 (56 bits) plus the high nibble of
    * byte 7.
    */
  // Named `compute`, not `eval`: the case class inherits Expression.eval,
  // which suppresses scalac's static forwarder — Janino then fails to
  // resolve the static call and Spark silently falls back to interpreted.
  def compute(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(Md5Prefix60(GraftColumnBridge.expression(c)))
}
