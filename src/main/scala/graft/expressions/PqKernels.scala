package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
  * space is split into `m` contiguous subspaces; each subspace has its
  * own `ksub`-entry codebook; a vector is stored as `m` small codes
  * (one byte each at ksub ≤ 256) instead of `dim` floats — a 32×
  * compression of the candidate side of an ANN scan, which at 100 TB
  * is the difference between an in-memory sweep and an I/O-bound one.
  *
  * All three kernels carry the codebook matrix as a codegen REFERENCE
  * object ([[HyperplaneSignBits]]'s pattern — inlining m × ksub × dsub
  * literals would blow the stage past HotSpot's JIT bytecode ceiling
  * and drop it to the interpreter).
  *
  * Arithmetic contract (what the DuckDB oracle reproduces exactly):
  * every accumulation is a left-to-right double fold starting at 0.0,
  * over ascending element index — subspace distances fold dsub terms,
  * and the full-dimension folds (ADC dot, reconstruction norm) walk
  * i = 0..dim−1 in order, which equals folding the CONCATENATED
  * reconstruction vector left-to-right. Sub-centroid assignment uses
  * strict `<`, so the LOWEST code wins distance ties.
  */
private[expressions] object PqCompute {

  /** books(sub)(code) is the dsub-element centroid. */
  def encode(v: ArrayData, books: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val cb = books(sub)
      val base = sub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val x = (if (isFloat) v.getFloat(base + i).toDouble
                   else v.getDouble(base + i)) - cent(i)
          acc += x * x
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(sub) = best
      sub += 1
    }
    new GenericArrayData(codes)
  }

  /** ‖recon‖² = Σ_i recon[i]² over the concatenated reconstruction,
    * i ascending.
    */
  def reconNormSq(codes: ArrayData,
      books: Array[Array[Array[Double]]]): Double = {
    val m = books.length
    val dsub = books(0)(0).length
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val cent = books(sub)(codes.getInt(sub))
      var i = 0
      while (i < dsub) { acc += cent(i) * cent(i); i += 1 }
      sub += 1
    }
    acc
  }

  /** ADC numerator: q · recon = Σ_i q[i]·recon[i], i ascending. */
  def adcDot(q: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Double]]], isFloat: Boolean): Double = {
    val m = books.length
    val dsub = books(0)(0).length
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      val cent = books(sub)(codes.getInt(sub))
      val base = sub * dsub
      var i = 0
      while (i < dsub) {
        val qi = if (isFloat) q.getFloat(base + i).toDouble
                 else q.getDouble(base + i)
        acc += qi * cent(i)
        i += 1
      }
      sub += 1
    }
    acc
  }

  def checkBooks(books: Seq[Seq[Seq[Double]]]): Unit = {
    require(books.nonEmpty && books.forall(_.nonEmpty),
      "PQ codebooks must have >= 1 subspace with >= 1 code")
    val dsub = books.head.head.size
    require(dsub > 0 && books.forall(_.forall(_.size == dsub)),
      "all PQ sub-centroids must share one sub-dimension")
  }

  def vecTypeCheck(t: DataType, what: String): TypeCheckResult = t match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what expects array<float|double>, got ${other.catalogString}")
  }
}

/** vec → array<int> of `m` sub-centroid codes (nearest by L2², ties to
  * the lowest code).
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  PqCompute.checkBooks(books)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    PqCompute.vecTypeCheck(child.dataType, "pq_encode")

  @transient private lazy val bookMatrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqCompute.encode(v.asInstanceOf[ArrayData], bookMatrix, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("pqBooks", bookMatrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.expressions.PqCompute$$.MODULE$$
         |  .encode($v, $bs, $vecIsFloat);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec), books))
}

/** codes → ‖reconstruction‖² (double). */
case class PqReconNormSq(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  PqCompute.checkBooks(books)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_recon_norm_sq expects array<int> codes, got ${t.catalogString}")
  }

  @transient private lazy val bookMatrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(codes: Any): Any =
    PqCompute.reconNormSq(codes.asInstanceOf[ArrayData], bookMatrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("pqBooks", bookMatrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.PqCompute$$.MODULE$$
         |  .reconNormSq($c, $bs);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqReconNormSq {
  def apply(codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(
      PqReconNormSq(GraftColumnBridge.expression(codes), books))
}

/** (query vec, codes) → ADC dot-product numerator q · recon (double). */
case class PqAdcDot(left: Expression, right: Expression,
    books: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  PqCompute.checkBooks(books)

  override def dataType: DataType = DoubleType

  private def vecIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = PqCompute.vecTypeCheck(left.dataType, "pq_adc_dot")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else right.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot expects array<int> codes, got ${t.catalogString}")
    }
  }

  @transient private lazy val bookMatrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqCompute.adcDot(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], bookMatrix, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bs = ctx.addReferenceObj("pqBooks", bookMatrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"""${ev.value} = graft.expressions.PqCompute$$.MODULE$$
         |  .adcDot($q, $c, $bs, $vecIsFloat);""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqAdcDot {
  def apply(qvec: Column, codes: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqAdcDot(GraftColumnBridge.expression(qvec),
      GraftColumnBridge.expression(codes), books))
}
