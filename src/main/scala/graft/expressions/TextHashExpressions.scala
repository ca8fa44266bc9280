package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-hash kernels. Semantically identical to the built-in
  * higher-order compositions they replace (and to the DuckDB oracle
  * formulations); they exist because a per-character `transform` +
  * `aggregate` chain interprets two lambdas per element — these run
  * one codegen'd loop instead.
  */

/** Polynomial rolling hash: fold over the string's code units,
  * `h := (h·131 + code) mod 1000000007`. Matches
  * `aggregate(transform(sequence(1, len), i -> ascii(substr(s,i,1))), 0, …)`
  * for BMP text (code unit = code point), and DuckDB's
  * `list_reduce(... ascii(substr(t,i,1)) ...)`.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  private val Mod = 1000000007L
  private val Base = 131L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  /** Static kernel shared by interpreted and generated paths. */
  // Named `compute`, not `eval`: the case class inherits Expression.eval,
  // which suppresses scalac's static forwarder — Janino then fails to
  // resolve the static call and Spark silently falls back to interpreted.
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) { h = (h * 131L + str.charAt(i)) % 1000000007L; i += 1 }
    h
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(RollingHash(GraftColumnBridge.expression(c)))
}

/** SimHash over a precomputed array of 60-bit token hashes: one pass
  * accumulates ±1 votes for each of `bits` bit positions, then sets
  * output bit i iff its vote sum is positive. Matches the 16-fold
  * built-in composition in semantics; runs 16× fewer passes.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    SimHashBits.compute(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SimHashBits.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashBits {
  def compute(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (((h >> b) & 1L) * 2L) - 1L
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def apply(c: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHashBits(GraftColumnBridge.expression(c), bits))
}
