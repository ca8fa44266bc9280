package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document LINE- and symbol-level quality signals —
  * the inputs of the Gopher repetition/format rules (Rae et al. 2021,
  * "Scaling Language Models", Table A1) that the token-level
  * [[TokenStats]] kernel cannot see:
  * `struct<n_lines, n_dup_lines, dup_line_chars, line_chars,
  * n_bullet, n_ellipsis, n_alpha_toks, n_sym_hits>` (all int).
  *
  * Definitions (each mirrors a DuckDB-expressible form so the oracle
  * can reproduce them exactly):
  *  - lines = text split on '\n' (Java split limit −1: a trailing
  *    newline yields a trailing empty line, '' yields ['']) — the
  *    `string_split(text, chr(10))` rule;
  *  - a line's "trim" strips ASCII spaces only (Spark/DuckDB `trim`
  *    default);
  *  - n_dup_lines counts line INSTANCES whose exact content appears
  *    more than once in the doc; dup_line_chars sums those instances'
  *    code-point lengths (the "fraction of chars in duplicate lines"
  *    numerator); line_chars sums all lines' lengths (its
  *    denominator — n_chars minus the newlines);
  *  - n_bullet / n_ellipsis count lines whose trim starts with
  *    '-' '*' '•' / ends with "..." or '…';
  *  - n_alpha_toks counts whitespace tokens (the [[TokenStats]]
  *    tokenization) containing at least one Unicode letter;
  *  - n_sym_hits counts '#' and '…' characters plus non-overlapping
  *    left-to-right "..." occurrences (the symbol-to-word numerator).
  *
  * Why a kernel: the Column form needs two splits, per-line
  * multiplicity (an explode + self-count, or an O(L²) interpreted
  * higher-order lambda) and four regex passes; this is one scan plus
  * one hash-map fold over the lines — map-only at any corpus size,
  * same argument as [[TokenStats]].
  */
case class LineStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LineStats.OutType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"line_stats expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    LineStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.LineStats$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LineStats {
  import org.apache.spark.sql.GraftColumnBridge

  val OutType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_dup_lines", IntegerType, nullable = false),
    StructField("dup_line_chars", IntegerType, nullable = false),
    StructField("line_chars", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_alpha_toks", IntegerType, nullable = false),
    StructField("n_sym_hits", IntegerType, nullable = false)))

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  // named compute, not eval — scalac emits no static forwarder for a
  // companion `eval` (clashes with Expression.eval); Janino would
  // silently fall back to interpreted evaluation
  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    // ---- line pass -------------------------------------------------
    val lines = s.split("\n", -1)
    val nLines = lines.length
    var lineChars = 0
    var nBullet = 0
    var nEllipsis = 0
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      lineChars += line.codePointCount(0, line.length)
      var lo = 0
      var hi = line.length
      while (lo < hi && line.charAt(lo) == ' ') lo += 1
      while (hi > lo && line.charAt(hi - 1) == ' ') hi -= 1
      if (lo < hi) {
        val c0 = line.charAt(lo)
        if (c0 == '-' || c0 == '*' || c0 == '•') nBullet += 1
        if (line.charAt(hi - 1) == '…' ||
            (hi - lo >= 3 && line.charAt(hi - 1) == '.' &&
              line.charAt(hi - 2) == '.' && line.charAt(hi - 3) == '.'))
          nEllipsis += 1
      }
      counts.merge(line, 1, (a, b) => a + b)
      i += 1
    }
    var nDup = 0
    var dupChars = 0
    i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (counts.get(line) > 1) {
        nDup += 1
        dupChars += line.codePointCount(0, line.length)
      }
      i += 1
    }
    // ---- symbol pass ----------------------------------------------
    var nSym = 0
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '#' || c == '…') { nSym += 1; i += 1 }
      else if (c == '.' && i + 2 < s.length &&
          s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
        nSym += 1; i += 3 // non-overlapping, left-to-right
      } else i += 1
    }
    // ---- token pass (TokenStats tokenization: ASCII-space trim,
    // \s+ split, empty -> no tokens) ---------------------------------
    var nAlpha = 0
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    if (lo < hi) {
      val toks = Whitespace.split(s.substring(lo, hi), -1)
      var j = 0
      while (j < toks.length) {
        val t = toks(j)
        var k = 0
        var found = false
        while (k < t.length && !found) {
          if (Character.isLetter(t.codePointAt(k))) found = true
          k += Character.charCount(t.codePointAt(k))
        }
        if (found) nAlpha += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      nLines, nDup, dupChars, lineChars, nBullet, nEllipsis, nAlpha, nSym))
  }

  def stats(text: Column): Column =
    GraftColumnBridge.column(LineStats(GraftColumnBridge.expression(text)))
}
