package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step over a symbol sequence: every LEFT-TO-RIGHT,
  * NON-OVERLAPPING occurrence of the adjacent pair (a, b) is replaced
  * by the single symbol a+b — the in-sequence update of Sennrich et
  * al. 2016's learn loop ("aaa" under merge (a,a) → ["aa","a"], the
  * standard greedy convention). One array scan; used vocab-table-side,
  * so the per-iteration cost is the vocabulary, never the corpus.
  */
case class MergeAdjacent(child: Expression, a: String, b: String)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_adjacent expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val uab = UTF8String.fromString(a + b)

  override def nullSafeEval(v: Any): Any =
    MergeAdjacent.compute(v.asInstanceOf[ArrayData], ua, ub, uab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("ua", ua, "org.apache.spark.unsafe.types.UTF8String")
    val rb = ctx.addReferenceObj("ub", ub, "org.apache.spark.unsafe.types.UTF8String")
    val rab = ctx.addReferenceObj("uab", uab, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.MergeAdjacent$$.MODULE$$.compute($v, $ra, $rb, $rab)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MergeAdjacent {
  import org.apache.spark.sql.GraftColumnBridge

  def compute(xs: ArrayData, a: UTF8String, b: UTF8String,
      ab: UTF8String): GenericArrayData = {
    val n = xs.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = xs.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && xs.getUTF8String(i + 1).equals(b)) {
        out.add(ab)
        i += 2 // non-overlapping: consumed both halves
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def merge(symbols: Column, a: String, b: String): Column =
    GraftColumnBridge.column(MergeAdjacent(
      GraftColumnBridge.expression(symbols), a, b))
}
