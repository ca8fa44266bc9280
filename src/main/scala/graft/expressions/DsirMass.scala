package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** DSIR per-document feature-mass fold as ONE compiled kernel:
  * `struct<n_feats, tgt_mass, raw_mass>` (all long) over a token
  * array, against a COLLECTED (tgt, raw) count model indexed by hashed
  * feature bucket. Replaces, bit-for-bit, the scoring half of
  * [[graft.operators.Sampling.dsirWeightsWith]]: explode of the hashed
  * unigram+bigram features (≈ 2·tokens rows per doc), the broadcast
  * join against the model, and the doc-keyed re-aggregation — the
  * whole corpus-mass row stream existed only to sum two bounded-table
  * lookups per feature. The model is BOUNDED at `buckets` rows by
  * construction (DSIR's fixed-size representation is its point), so it
  * ships inside the expression exactly like a broadcast relation.
  *
  * Feature hashing is the portable family, reproduced exactly:
  * unigram bucket = `md5prefix60(tok) pmod buckets`, bigram bucket =
  * `md5prefix60(w1 || \\u0001 || w2) pmod buckets`
  * ([[graft.operators.Sampling.dsirFeatures]] /
  * `CorpusStats.bigramPairs` — \\u0001 is one 0x01 byte in UTF-8, so
  * the byte-level concat equals the SQL string concat). md5prefix60 is
  * positive, so `pmod ≡ %`. NULL array elements contribute nothing
  * (the SQL path hashed them to NULL features, which every aggregate
  * skipped); pass a non-null array (coalesce with `array()`) — a doc
  * with no tokens folds to (0, 0, 0), the same zero mass the old
  * outer-explode null row produced.
  *
  * This is the codegen'd fixed-width fold VERDICT r17 asked for: the
  * round-17 HOF attempt (aggregate + element_at over a literal model)
  * lost 45% to interpreted lambda evaluation; `compute` is one md5 +
  * two array reads per feature, whole-stage-codegen'd.
  */
case class DsirMass(child: Expression, buckets: Int,
    tgt: Array[Long], raw: Array[Long])
  extends UnaryExpression {

  override def dataType: DataType = DsirMass.OutType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_mass expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    DsirMass.compute(v.asInstanceOf[ArrayData], buckets, tgt, raw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("dsirTgt", tgt, "long[]")
    val r = ctx.addReferenceObj("dsirRaw", raw, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.DsirMass$$.MODULE$$.compute($v, $buckets, $t, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirMass {
  import org.apache.spark.sql.GraftColumnBridge

  val OutType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("tgt_mass", LongType, nullable = false),
    StructField("raw_mass", LongType, nullable = false)))

  // named compute, not eval — scalac emits no static forwarder for a
  // companion `eval` (clashes with Expression.eval); Janino would
  // silently fall back to interpreted evaluation
  def compute(toks: ArrayData, buckets: Int,
      tgt: Array[Long], raw: Array[Long]): GenericInternalRow = {
    val n = toks.numElements()
    var nFeats = 0L
    var tgtMass = 0L
    var rawMass = 0L
    def hit(bytes: Array[Byte]): Unit = {
      val b = (Md5Prefix60.compute(bytes) % buckets).toInt
      nFeats += 1L
      tgtMass += tgt(b)
      rawMass += raw(b)
    }
    var i = 0
    var prev: Array[Byte] = null // previous token's UTF-8 bytes, null if absent
    while (i < n) {
      if (toks.isNullAt(i)) {
        prev = null // a NULL token voids both features it touches
      } else {
        val cur = toks.getUTF8String(i).getBytes
        hit(cur)
        if (prev != null) {
          val bg = new Array[Byte](prev.length + 1 + cur.length)
          System.arraycopy(prev, 0, bg, 0, prev.length)
          bg(prev.length) = 0x01 // U+0001, the bigram separator
          System.arraycopy(cur, 0, bg, prev.length + 1, cur.length)
          hit(bg)
        }
        prev = cur
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nFeats, tgtMass, rawMass))
  }

  def mass(toks: Column, buckets: Int,
      tgt: Array[Long], raw: Array[Long]): Column =
    GraftColumnBridge.column(DsirMass(
      GraftColumnBridge.expression(toks), buckets, tgt, raw))
}
