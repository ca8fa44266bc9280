package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two dense vectors (`array<float>` or
  * `array<double>`), accumulating left-to-right in double.
  *
  * Exists for the similarity hot loop: the built-in composition
  * `aggregate(zip_with(cast(a), cast(b), _*_), 0d, _+_)` materializes
  * two intermediate arrays and drives three HigherOrderFunction
  * interpreters per pair; this expression is a single fused loop that
  * stays inside WholeStageCodegen. The arithmetic is bit-identical to
  * the built-in form (and to the DuckDB oracle's list_reduce): each
  * element widened float→double (exact), products summed in order
  * `((0+p₁)+p₂)+…` — swapping in this expression never changes a
  * score, only the time to compute it.
  *
  * Null semantics mirror the zip_with form: null input → null; length
  * mismatch or any null element → null.
  */
case class VectorDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects array<float>/array<double>, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elemType(left).contains(FloatType)
    val yf = elemType(right).contains(FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      def getter(arr: String, isFloat: Boolean) =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val ga = getter(a, elemType(left).contains(FloatType))
      val gb = getter(b, elemType(right).contains(FloatType))
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $acc = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ($ga) * ($gb);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorDotProduct {
  import org.apache.spark.sql.GraftColumnBridge

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
