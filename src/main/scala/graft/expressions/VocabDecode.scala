package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The decode half of the tokenizer: array<int> token ids → the text
  * they encode, under a FIXED vocabulary — [[VocabIds]]' inverse.
  * Vocabulary ids append their symbol; ids inside the reserved byte
  * range `[byteBase, byteBase+256)` append their RAW byte, so byte
  * runs produced by the encode fallback reassemble into the original
  * UTF-8 sequence (a multi-byte code point split across 2–4 byte
  * tokens decodes losslessly because the output is assembled in BYTE
  * space and lifted to a string once at the end). With `byteBase < 0`
  * there is no byte range and every id must be a vocabulary entry.
  *
  * An id that is neither a vocabulary entry nor a byte token throws —
  * a foreign or torn vocabulary must never silently produce wrong
  * text (same loud-failure stance as
  * [[graft.operators.Bpe.loadTokenizerVersioned]]).
  *
  * One hash table per expression instance (int → UTF-8 bytes),
  * O(1)/id, codegen'd — the mirror of [[VocabIds]]' design for the
  * same reason.
  */
case class VocabDecode(child: Expression, vocab: Seq[(Int, String)],
    byteBase: Int = -1)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vocab_decode expects array<int>, got ${t.catalogString}")
  }

  @transient private lazy val table: VocabDecode.Table =
    VocabDecode.Table(vocab)

  override def nullSafeEval(v: Any): Any =
    VocabDecode.compute(v.asInstanceOf[ArrayData], table, byteBase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("decodeTable", table,
      "graft.expressions.VocabDecode.Table")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VocabDecode$$.MODULE$$.compute($v, $t, $byteBase)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VocabDecode {

  /** id → UTF-8 symbol bytes; transient and rebuilt lazily
    * executor-side, like [[VocabIds.Table]].
    */
  final class Table(entries: Seq[(Int, String)]) extends Serializable {
    @transient lazy val map: java.util.HashMap[Integer, Array[Byte]] = {
      val m = new java.util.HashMap[Integer, Array[Byte]](entries.size * 2)
      entries.foreach { case (i, s) =>
        m.put(Integer.valueOf(i), s.getBytes("UTF-8"))
      }
      m
    }
  }

  object Table {
    def apply(entries: Seq[(Int, String)]): Table = new Table(entries)
  }

  def compute(ids: ArrayData, t: Table, byteBase: Int): UTF8String = {
    val n = ids.numElements()
    val m = t.map
    val out = new java.io.ByteArrayOutputStream(n * 4)
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      val sym = m.get(Integer.valueOf(id))
      if (sym != null) out.write(sym, 0, sym.length)
      else if (byteBase >= 0 && id >= byteBase && id < byteBase + 256)
        out.write(id - byteBase)
      else throw new IllegalArgumentException(
        s"vocab_decode: id $id is neither a vocabulary entry nor a " +
          s"byte token (byteBase=$byteBase) - foreign/torn vocabulary?")
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  def decode(ids: Column, vocab: Seq[(Int, String)],
      byteBase: Int = -1): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VocabDecode(
      GraftColumnBridge.expression(ids), vocab, byteBase))
  }
}
