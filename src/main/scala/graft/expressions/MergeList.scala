package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A full ordered BPE merge LIST applied in one kernel pass — the
  * at-scale form of chaining one [[MergeAdjacent]] per merge. Chained
  * expressions are exact but bounded: at realistic merge counts
  * (10k–50k) a 50k-deep expression tree blows Janino method limits and
  * planner time, so the encode path needs the list INSIDE one
  * expression. Semantics are pinned equal to the fold
  * (`BpeSpec`): for each merge in rank order, every left-to-right
  * non-overlapping occurrence of the adjacent pair (a, b) is replaced
  * by the single symbol a+b.
  *
  * Cost shape: a per-row symbol-count table makes each merge a O(1)
  * presence probe — the O(len) rescan only runs for merges whose BOTH
  * halves are still present in the row — so a short word pays ~nMerges
  * hash probes, not nMerges array scans. Used vocab-table-side (the
  * Heaps-law word table), never against the corpus.
  */
case class MergeList(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_list expects array<string>, got ${t.catalogString}")
  }

  @transient private lazy val table: MergeList.Table = MergeList.Table(merges)

  override def nullSafeEval(v: Any): Any =
    MergeList.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("mergeTable", table,
      "graft.expressions.MergeList.Table")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.MergeList$$.MODULE$$.compute($v, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MergeList {

  /** Rank-ordered merge list pre-lifted to UTF8String triples (a, b,
    * a+b). Built once per expression instance, shared by every row.
    */
  final class Table(val a: Array[UTF8String], val b: Array[UTF8String],
      val ab: Array[UTF8String]) extends Serializable {
    def size: Int = a.length
  }

  object Table {
    def apply(merges: Seq[(String, String)]): Table = new Table(
      merges.map(m => UTF8String.fromString(m._1)).toArray,
      merges.map(m => UTF8String.fromString(m._2)).toArray,
      merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray)
  }

  private def bump(counts: java.util.HashMap[UTF8String, Integer],
      s: UTF8String, d: Int): Unit = {
    val cur = counts.get(s)
    val next = (if (cur == null) 0 else cur.intValue()) + d
    if (next <= 0) counts.remove(s)
    else counts.put(s, Integer.valueOf(next))
  }

  def compute(xs: ArrayData, t: Table): GenericArrayData = {
    val n = xs.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val buf = new Array[UTF8String](n)
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      val s = xs.getUTF8String(i)
      buf(i) = s
      bump(counts, s, 1)
      i += 1
    }
    var len = n
    var m = 0
    val nm = t.size
    while (m < nm && len >= 2) {
      val a = t.a(m)
      val b = t.b(m)
      val ca = counts.get(a)
      // presence probe: a pair can only occur if both halves survive in
      // the row (a == b needs two); absent ⇒ the scan would be a no-op
      val candidate =
        if (ca == null) false
        else if (a.equals(b)) ca.intValue() >= 2
        else counts.get(b) != null
      if (candidate) {
        val ab = t.ab(m)
        var r = 0
        var w = 0
        while (r < len) {
          if (r + 1 < len && buf(r).equals(a) && buf(r + 1).equals(b)) {
            buf(w) = ab
            bump(counts, a, -1)
            bump(counts, b, -1)
            bump(counts, ab, 1)
            r += 2 // non-overlapping: consumed both halves
          } else {
            buf(w) = buf(r)
            r += 1
          }
          w += 1
        }
        len = w
      }
      m += 1
    }
    val out = new Array[AnyRef](len)
    System.arraycopy(buf, 0, out, 0, len)
    new GenericArrayData(out)
  }

  def merge(symbols: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MergeList(
      GraftColumnBridge.expression(symbols), merges))
  }
}
