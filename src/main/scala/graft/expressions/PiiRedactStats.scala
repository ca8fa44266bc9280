package graft.expressions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass-per-pattern PII redaction statistics:
  * `struct<n_emails int, n_phones int, redacted string>`.
  *
  * Replaces, bit-for-bit, the four-regex-scan Column composition
  *  - `size(regexp_extract_all(t, EMAIL))`   (count over RAW text)
  *  - `size(regexp_extract_all(t, PHONE))`   (count over RAW text)
  *  - `regexp_replace(regexp_replace(t, EMAIL, "[EMAIL]"), PHONE,
  *    "[PHONE]")`                            (SEQUENTIAL replace)
  * with at most three regex scans and usually two: the email pass
  * counts and replaces together; when no email matched, the
  * email-redacted text IS the raw text, so the phone pass also counts
  * and replaces in one scan. Only documents that contain an email pay
  * a third scan — the phone COUNT is defined over the raw text while
  * the phone REPLACE runs over the email-redacted text (an email match
  * can swallow an overlapping phone, e.g. `+12345678u@bc.de` counts
  * one of each but redacts to a single `[EMAIL]`), so the two phone
  * traversals are genuinely different strings and cannot be fused.
  *
  * Why a kernel: `regexp_extract_all` materializes an array of
  * UTF8Strings per document and `regexp_replace` re-parses its
  * replacement for `$` group references on every match — measured
  * ~131 µs/doc and super-linear wall growth (GC) at sf3. This kernel
  * reuses per-thread Matchers, builds the output with one lazily
  * allocated StringBuilder (no allocation at all for documents with
  * no matches beyond the `toString`), and never parses replacements.
  */
case class PiiRedactStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiRedactStats.OutType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pii_redact_stats expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    PiiRedactStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.PiiRedactStats$$.MODULE$$.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiRedactStats {
  import org.apache.spark.sql.GraftColumnBridge

  val OutType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  // Same pattern constants as graft.functions.TextFunctions — spelled
  // here (not referenced) to keep expressions free of a functions->
  // expressions->functions import cycle; TextFunctionsSpec pins the
  // two spellings equal.
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRegex = "\\+[0-9]{8,15}"

  private val EmailP = Pattern.compile(EmailRegex)
  private val PhoneP = Pattern.compile(PhoneRegex)

  // Matcher is not thread-safe but IS reset()-reusable; tasks are
  // thread-bound, so per-thread instances delete the per-row Matcher
  // allocation that regexp_* expressions pay.
  private val emailM: ThreadLocal[Matcher] =
    ThreadLocal.withInitial(() => EmailP.matcher(""))
  private val phoneM: ThreadLocal[Matcher] =
    ThreadLocal.withInitial(() => PhoneP.matcher(""))

  /** Count + replace in one scan. Returns the match count; the caller
    * reads the (possibly null) builder for the rewritten text.
    */
  private def scanReplace(m: Matcher, s: String, token: String,
      out: Array[java.lang.StringBuilder]): Int = {
    m.reset(s)
    var n = 0
    var last = 0
    var sb: java.lang.StringBuilder = null
    while (m.find()) {
      n += 1
      if (sb == null) sb = new java.lang.StringBuilder(s.length + 8)
      sb.append(s, last, m.start()).append(token)
      last = m.end()
    }
    if (sb != null) sb.append(s, last, s.length)
    out(0) = sb
    n
  }

  // named compute, not eval — scalac emits no static forwarder for a
  // companion `eval` (clashes with Expression.eval); Janino would
  // silently fall back to interpreted evaluation
  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    // literal prescans: the email pattern cannot match without '@'
    // nor the phone pattern without '+', and indexOf costs ~an order
    // of magnitude less per byte than a regex scan — isolated sf100z
    // x_text_redact measured 26.3 → 13.1 s (runs=3 lower-median)
    // even though 2/3 of that corpus's docs carry planted PII; on a
    // mostly-clean real corpus the regex scans vanish almost
    // entirely
    if (s.indexOf('@') < 0 && s.indexOf('+') < 0)
      return new GenericInternalRow(Array[Any](0, 0, text))
    val slot = new Array[java.lang.StringBuilder](1)

    val nEmails =
      if (s.indexOf('@') < 0) 0
      else scanReplace(emailM.get(), s, "[EMAIL]", slot)
    val afterEmail = if (slot(0) == null) s else slot(0).toString

    val hasPlus = s.indexOf('+') >= 0
    var nPhones = 0
    var redacted: String = null
    if (!hasPlus) {
      redacted = afterEmail
    } else if (nEmails == 0) {
      // raw text == email-redacted text: one phone scan does both
      nPhones = scanReplace(phoneM.get(), s, "[PHONE]", slot)
      redacted = if (slot(0) == null) s else slot(0).toString
    } else {
      val pm = phoneM.get()
      pm.reset(s)
      while (pm.find()) nPhones += 1
      scanReplace(pm, afterEmail, "[PHONE]", slot)
      redacted = if (slot(0) == null) afterEmail else slot(0).toString
    }
    new GenericInternalRow(Array[Any](
      nEmails, nPhones, UTF8String.fromString(redacted)))
  }

  def stats(text: Column): Column =
    GraftColumnBridge.column(PiiRedactStats(
      GraftColumnBridge.expression(text)))
}
