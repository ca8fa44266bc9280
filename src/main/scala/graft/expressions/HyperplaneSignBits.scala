package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** LSH bucket id — bit h = (v · plane_h ≥ 0) — for ALL planes in one
  * kernel call. Replaces the Column composition
  * `planes.map(p => when(dot(v, typedLit(p)) >= 0, 1L << h)).reduce(+)`,
  * which inlines nPlanes × dim literal array constructions into the
  * generated stage: at 30 × 64 the fused whole-stage method blows past
  * HotSpot's 8000-bytecode JIT limit and the ENTIRE stage runs in the
  * bytecode interpreter — the sf100 stage probe measured the
  * 30-plane raw-vector bucketing at 235 s for a 2M-row scan whose
  * arithmetic (30 · 64 mults/row) is worth single-digit seconds. Same
  * disease and same cure as [[RankedCentroidCells]]: the plane matrix
  * rides along as a reference object, the generated code is one call,
  * the stage stays JIT-compiled.
  *
  * Arithmetic is bit-identical to the Column form (and the DuckDB
  * oracle's `bucketSql`): each dot accumulates left-to-right in
  * double (floats widened exactly), sign test is `>= 0`.
  */
case class HyperplaneSignBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63,
    s"sign bits pack into one long: need 1..63 planes, got ${planes.size}")

  override def dataType: DataType = LongType

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sign_bits expects array<float|double>, got ${t.catalogString}")
  }

  @transient private lazy val planeMatrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    HyperplaneSignBits.compute(
      v.asInstanceOf[ArrayData], planeMatrix, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("planeMatrix", planeMatrix, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.expressions.HyperplaneSignBits$$.MODULE$$
         |  .compute($v, $ps, $vecIsFloat);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignBits {

  // named compute, not eval: scalac emits no static forwarder for
  // `eval` (clashes with Expression.eval) and Janino then falls back
  def compute(v: ArrayData, planes: Array[Array[Double]],
      isFloat: Boolean): Long = {
    val dim = v.numElements()
    var bits = 0L
    var h = 0
    while (h < planes.length) {
      val p = planes(h)
      val d = math.min(dim, p.length)
      var acc = 0.0
      var i = 0
      if (isFloat) while (i < d) { acc += v.getFloat(i).toDouble * p(i); i += 1 }
      else while (i < d) { acc += v.getDouble(i) * p(i); i += 1 }
      if (acc >= 0) bits |= 1L << h
      h += 1
    }
    bits
  }

  def apply(vec: Column, planes: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(HyperplaneSignBits(
      GraftColumnBridge.expression(vec), planes))
}
