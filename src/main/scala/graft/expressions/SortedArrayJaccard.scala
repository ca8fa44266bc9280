package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two SORTED, DISTINCT long arrays via a single
  * merge scan — O(n+m) versus the O(n·m) `array_intersect` lookup
  * chain, and no intermediate array allocation. Used by the dedup
  * verifiers on hashed shingle sets.
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard expects array<bigint>, got ${l.catalogString}/${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrayJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.SortedArrayJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SortedArrayJaccard {
  // Named `compute`, not `eval`: the case class inherits Expression.eval,
  // which suppresses scalac's static forwarder — Janino then fails to
  // resolve the static call and Spark silently falls back to interpreted.
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter).toDouble
  }

  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedArrayJaccard(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
