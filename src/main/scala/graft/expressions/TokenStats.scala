package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document token statistics:
  * `struct<n_chars, n_tokens, n_punct, n_dict, tok_len_sum,
  * n_distinct, top_n>` (all int) — the inputs of the quality-score and
  * repetition-signal queries, fused.
  *
  * Replaces, bit-for-bit:
  *  - `length(text)` (code points),
  *  - `size(tokens)` where tokens = `split(trim(text), "\\s+")` with
  *    the empty-after-space-trim → `[]` rule (trim strips ASCII
  *    spaces ONLY, like Spark's `trim`; Java split semantics with
  *    limit −1, leading empty token preserved),
  *  - the `\p{Punct}` count (`length − length(regexp_replace(…))`),
  *  - multiplicity-preserving dictionary hits,
  *  - `aggregate(transform(toks, length), 0, +)` token-length sum,
  *  - `size(array_distinct(toks))`,
  *  - the max per-token multiplicity (previously an explode + two
  *    aggregations — a corpus-sized shuffle this kernel deletes: the
  *    per-doc token multiset is bounded by the doc, so the fold is
  *    map-only at any corpus size).
  *
  * Why a kernel: the Column composition drives four interpreted
  * higher-order-function lambdas plus two regex passes per document,
  * and the repetition signals pay an explode shuffle besides —
  * measured 128 µs/doc at sf1. This is a single scan of the string
  * plus one hash-map fold over its tokens.
  */
case class TokenStats(child: Expression, dict: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = TokenStats.OutType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects string, got ${t.catalogString}")
  }

  @transient private lazy val dictSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    dict.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    TokenStats.compute(v.asInstanceOf[UTF8String], dictSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("dictSet", dictSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.TokenStats$$.MODULE$$.compute($v, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  import org.apache.spark.sql.GraftColumnBridge

  val OutType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_dict", IntegerType, nullable = false),
    StructField("tok_len_sum", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_n", IntegerType, nullable = false)))

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  // named compute, not eval — scalac emits no static forwarder for a
  // companion `eval` (clashes with Expression.eval); Janino would
  // silently fall back to interpreted evaluation
  def compute(text: UTF8String, dict: java.util.HashSet[String]): GenericInternalRow = {
    val s = text.toString
    val nChars = s.codePointCount(0, s.length)
    var nPunct = 0
    var i = 0
    while (i < s.length) {
      if (isPunct(s.charAt(i))) nPunct += 1
      i += 1
    }
    // Spark trim() strips ASCII spaces only (not tabs/newlines)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = s.substring(lo, hi)
    var nTokens = 0
    var nDict = 0
    var lenSum = 0
    var topN = 0
    var nDistinct = 0
    if (trimmed.nonEmpty) {
      val toks = Whitespace.split(trimmed, -1)
      nTokens = toks.length
      val counts = new java.util.HashMap[String, Int]()
      var j = 0
      while (j < toks.length) {
        val t = toks(j)
        if (dict.contains(t)) nDict += 1
        lenSum += t.codePointCount(0, t.length)
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > topN) topN = c
        j += 1
      }
      nDistinct = counts.size()
    }
    new GenericInternalRow(Array[Any](
      nChars, nTokens, nPunct, nDict, lenSum, nDistinct, topN))
  }

  def stats(text: Column, dict: Seq[String]): Column =
    GraftColumnBridge.column(TokenStats(
      GraftColumnBridge.expression(text), dict))
}
