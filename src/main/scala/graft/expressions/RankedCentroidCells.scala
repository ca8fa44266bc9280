package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF cell ranking as ONE compact kernel: for a vector `v` with
  * precomputed squared norm, returns `array<struct<ns:double,
  * cell:int>>` sorted ascending by (ns = −cosine(v, centroid), cell) —
  * exactly what `sort_array(array(struct(−cos, i), …))` over literal
  * centroid columns produces, including Spark's double ordering
  * (−0.0 == 0.0, NaN greatest) and the cell-ascending tie-break.
  *
  * Exists because the Column composition inlines nlist × dim literal
  * array constructions into the generated stage: at 8 × 64 the fused
  * whole-stage method blows past HotSpot's 8000-bytecode JIT limit and
  * the ENTIRE stage (scan, join, everything fused with it) runs in the
  * bytecode interpreter — measured 5.4 s for a 20k-row stage at sf1,
  * ~270 µs/row. Here the centroid matrix rides along as a reference
  * object and the generated code is a single call, so the stage stays
  * JIT-compiled.
  *
  * The arithmetic is bit-identical to the Column form (and so to the
  * DuckDB oracle): dot accumulated left-to-right in double
  * (float widened exactly), `cos = dot / (sqrt(nsq) · sqrt(‖c‖²))` in
  * that association, centroid norms left-folded at construction.
  */
case class RankedCentroidCells(left: Expression, right: Expression,
    centroids: Seq[Seq[Double]]) extends BinaryExpression {

  override def dataType: DataType = RankedCentroidCells.OutType
  override def nullable: Boolean = left.nullable || right.nullable

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"ranked_cells expects (array<float|double>, double), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  @transient private lazy val centMatrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centNorms: Array[Double] =
    centroids.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray

  override def nullSafeEval(v: Any, n: Any): Any =
    RankedCentroidCells.compute(v.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], centMatrix, centNorms, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centMatrix", centMatrix, "double[][]")
    val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"""${ev.value} = graft.expressions.RankedCentroidCells$$.MODULE$$
         |  .compute($v, $n, $cents, $norms, $vecIsFloat);""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RankedCentroidCells {
  import org.apache.spark.sql.GraftColumnBridge

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("ns", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false))), containsNull = false)

  /** Spark's SQL double ordering: −0.0 == 0.0, NaN greatest
    * (SQLOrderingUtil.compareDoubles semantics).
    */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  // named compute, not eval: scalac emits no static forwarder for
  // `eval` (clashes with Expression.eval) and Janino then falls back
  def compute(v: ArrayData, nsq: Double, cents: Array[Array[Double]],
      norms: Array[Double], isFloat: Boolean): ArrayData = {
    val k = cents.length
    val ns = new Array[Double](k)
    val idx = new Array[Integer](k)
    val sq = math.sqrt(nsq)
    var i = 0
    while (i < k) {
      val c = cents(i)
      var acc = 0.0
      // a silent min() here would mis-rank malformed vectors (truncated
      // dot product), where the Column form it replaced surfaced nulls;
      // a dimension mismatch must fail loudly, not corrupt the ANN
      require(v.numElements() == c.length,
        s"vector dimension ${v.numElements()} != centroid dimension ${c.length}")
      val n = c.length
      var j = 0
      while (j < n) {
        val xv = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += xv * c(j)
        j += 1
      }
      ns(i) = -(acc / (sq * math.sqrt(norms(i))))
      idx(i) = i
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = cmpDouble(ns(a), ns(b))
        if (c != 0) c else Integer.compare(a, b)
      }
    })
    new GenericArrayData(idx.map(i =>
      new GenericInternalRow(Array[Any](ns(i), i.intValue())): Any))
  }

  def ranked(vec: Column, normSq: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(RankedCentroidCells(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(normSq),
      centroids))
}
