package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document language-profile hit fold as ONE compiled kernel:
  * `struct<n_grams: long, hits: array<long>>` over a text column,
  * against a COLLECTED char-n-gram model (gram → one count per
  * language, language order fixed by the caller). Replaces, value-for-
  * value, the scoring mass of
  * [[graft.operators.CorpusStats.langClassifyWith]]: the corpus
  * char-gram explode (≈ one row per CHARACTER of the corpus), the
  * broadcast join against the pivoted model, and the doc-keyed
  * re-aggregation — that whole row stream existed only to sum
  * |langs| bounded-table lookups per gram. The model is vocab-bounded
  * (the same table the pivot+broadcast form already shipped to every
  * executor), so it rides inside the expression exactly like a
  * broadcast hash relation.
  *
  * Gram semantics reproduce `charGramsOf ∘ split(text, "")` exactly:
  * grams are the `numChars - (n-1)` consecutive n-code-point
  * substrings (split("") splits at code-point boundaries — Java's
  * zero-width match never lands inside a surrogate pair — and
  * UTF8String walks code points the same way); a text shorter than
  * `n` code points yields `(0, null)`, matching the
  * `when(len >= n, …).otherwise(array())` + outer-explode null row.
  * `hits` is NULL unless at least one gram matched the model — the
  * all-or-nothing contract of the old left join + na.fill(0) pivot
  * (one matched row fills every language column), which
  * langClassifyWith's 'und' arm keys on.
  *
  * Codegen'd fixed-width fold in the [[DsirMass]]/[[CountMinEstimate]]
  * family (VERDICT r17 item 2): `compute` is one byte-offset walk +
  * one hash-map probe per gram, whole-stage-codegen'd via
  * [[doGenCode]] — no interpreted HOF lambdas (the convicted r17
  * shape).
  */
case class LangGramHits(child: Expression, n: Int, nLangs: Int,
    model: java.util.HashMap[UTF8String, Array[Long]])
  extends UnaryExpression {

  override def dataType: DataType = LangGramHits.outType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_gram_hits expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    LangGramHits.compute(v.asInstanceOf[UTF8String], n, nLangs, model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langGramModel", model,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, long[]>")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.LangGramHits$$.MODULE$$.compute($v, $n, $nLangs, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangGramHits {
  import org.apache.spark.sql.GraftColumnBridge

  val outType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false),
      nullable = true)))

  // named compute, not eval — scalac emits no static forwarder for a
  // companion `eval` (clashes with Expression.eval); Janino would
  // silently fall back to interpreted evaluation
  def compute(t: UTF8String, n: Int, nLangs: Int,
      model: java.util.HashMap[UTF8String, Array[Long]]): GenericInternalRow = {
    val bytes = t.getBytes
    // one pass to index code-point byte offsets (UTF8String.substring
    // would re-walk from 0 per gram — O(len²) on long docs)
    val nBytes = bytes.length
    var chars = 0
    var i = 0
    while (i < nBytes) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      chars += 1
    }
    if (chars < n) return new GenericInternalRow(Array[Any](0L, null))
    val offs = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(chars) = nBytes
    val nGrams = chars - (n - 1)
    val hits = new Array[Long](nLangs)
    var any = false
    var g = 0
    while (g < nGrams) {
      val from = offs(g)
      val until = offs(g + n)
      val cnts = model.get(UTF8String.fromBytes(bytes, from, until - from))
      if (cnts != null) {
        any = true
        var j = 0
        while (j < nLangs) { hits(j) += cnts(j); j += 1 }
      }
      g += 1
    }
    new GenericInternalRow(Array[Any](nGrams.toLong,
      if (any) new GenericArrayData(hits) else null))
  }

  def hits(text: Column, n: Int, nLangs: Int,
      model: java.util.HashMap[UTF8String, Array[Long]]): Column =
    GraftColumnBridge.column(LangGramHits(
      GraftColumnBridge.expression(text), n, nLangs, model))
}
