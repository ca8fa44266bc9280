package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-ID kernel. Tokenizes once and counts all four
  * function-word dictionaries in a single scan — the column-built
  * version re-evaluates `split` + `lower` per dictionary because
  * Catalyst's CollapseProject inlines the shared token projection into
  * every consumer.
  *
  * Decision logic (identical to `TextFunctions.langGuess` and the
  * DuckDB oracle): CJK presence ⇒ zh; all counts zero ⇒ und; else
  * argmax with priority en ≥ es ≥ fr ≥ de.
  */
case class LangGuess(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_guess expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(LangGuess.compute(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expressions.LangGuess.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangGuess {
  // must stay in sync with graft.functions.TextFunctions dictionaries
  private val dicts: Array[Set[String]] = Array(
    Set("the", "and", "of", "to", "in", "is", "that", "it"),
    Set("el", "la", "de", "que", "y", "en", "un", "es"),
    Set("le", "la", "de", "et", "les", "des", "une", "dans"),
    Set("der", "die", "und", "das", "ist", "von", "ein", "mit"))
  private val names = Array("en", "es", "fr", "de")

  // Named `compute`, not `eval`: the case class inherits Expression.eval,
  // which suppresses scalac's static forwarder — Janino then fails to
  // resolve the static call and Spark silently falls back to interpreted.
  def compute(text: String): String = {
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return "zh"
      i += 1
    }
    val counts = new Array[Int](4)
    // single tokenize pass over the lowercased text
    val toks = text.toLowerCase.trim
    if (toks.nonEmpty) {
      var start = 0
      var j = 0
      val n = toks.length
      while (j <= n) {
        if (j == n || Character.isWhitespace(toks.charAt(j))) {
          if (j > start) {
            val w = toks.substring(start, j)
            var d = 0
            while (d < 4) { if (dicts(d).contains(w)) counts(d) += 1; d += 1 }
          }
          start = j + 1
        }
        j += 1
      }
    }
    if (counts(0) == 0 && counts(1) == 0 && counts(2) == 0 && counts(3) == 0) "und"
    else if (counts(0) >= counts(1) && counts(0) >= counts(2) && counts(0) >= counts(3)) "en"
    else if (counts(1) >= counts(2) && counts(1) >= counts(3)) "es"
    else if (counts(2) >= counts(3)) "fr"
    else "de"
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(LangGuess(GraftColumnBridge.expression(c)))
}
