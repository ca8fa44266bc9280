package graft.expressions

import java.util.Arrays

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Distinct sorted hashes of a token array's word n-gram shingles,
  * computed without ever materializing an n-gram string:
  *
  *   th(t)  = md5_prefix60(t) mod P          (per token, one digest)
  *   H(i)   = fold(th(i..i+n-1), (a,b) → a·131 + b) mod P
  *
  * Intermediates stay < P·131ⁿ⁻¹ < 2⁶³ for n ≤ 5 (the div-free fast
  * path); wider windows reduce mod P at each fold step — congruent by
  * the mod ring homomorphism, so the one DuckDB formulation
  * `list_reduce(list_prepend(0, th[i:i+n-1]), (a,b) -> (a*131 + b) % P)`
  * reproduces every n (and the per-step form is REQUIRED there past
  * n = 5, where DuckDB's end-only fold raises on BIGINT overflow).
  * Shorter-than-n docs produce one shingle over whatever is there
  * (empty → hash 0), mirroring the index range max(len−n+1, 1).
  *
  * Output element type is INT32: every hash is in [0, P) ⊂ [0, 2³⁰),
  * so int32 holds the identical value — and the shingle sets are the
  * single biggest payload the dedup family shuffles (the sf100 probe
  * measured the exact-Jaccard verify joins, which move two set arrays
  * per candidate pair, as the dominant stage). Halving the element
  * width halves that exchange and the per-doc set cache. Consumers
  * that do mod-P arithmetic on the elements (the seeded minhash
  * family) promote to int64 first; the DuckDB oracle keeps computing
  * BIGINT — equal values, so results stay bit-matched.
  *
  * Replaces: slice + array_join per shingle + md5-per-shingle — the
  * dominant cost of every shingle-based dedup query.
  */
case class WordShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  // window width is unbounded in principle; 256 is a sanity rail (a
  // "shingle" wider than any real passage is a caller bug). n ≤ 5
  // folds without per-step reduction (P·131^(n-1) < 2^63); wider
  // windows reduce mod P each step — congruent results, one extra
  // division per step on that path only.
  require(n >= 1 && n <= 256, s"word_shingle_hashes supports n in [1,256], got $n")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingleHashes.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {
  private val P = 1000000007L

  // Named `compute`, not `eval`: the case class inherits Expression.eval,
  // which suppresses scalac's static forwarder — Janino then fails to
  // resolve the static call and Spark silently falls back to interpreted.
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val k = tokens.numElements()
    val th = new Array[Long](k)
    var i = 0
    while (i < k) {
      th(i) = Md5Prefix60.compute(tokens.getUTF8String(i).getBytes) % P
      i += 1
    }
    val m = math.max(k - n + 1, 1)
    val out = new Array[Int](m)
    i = 0
    while (i < m) {
      var acc = 0L
      var j = i
      val end = math.min(i + n, k)
      if (n <= 5) {
        // div-free fast path: intermediates stay < P·131⁴ < 2⁶³
        while (j < end) { acc = acc * 131L + th(j); j += 1 }
      } else {
        // wide windows would overflow the raw fold (P·131⁷ > 2⁶³);
        // reducing each step is congruent — mod is a ring homomorphism
        while (j < end) { acc = (acc * 131L + th(j)) % P; j += 1 }
      }
      out(i) = (acc % P).toInt // exact: the residue is in [0, P) < 2^30
      i += 1
    }
    Arrays.sort(out)
    // in-place distinct on the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Arrays.copyOf(out, w))
  }

  def apply(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingleHashes(
      GraftColumnBridge.expression(tokens), n))
}

/** POSITIONAL variant of [[WordShingleHashes]]: the hash of EVERY
  * n-token window in order — element i is the window starting at
  * token i — with no distinct/sort, for consumers that need to map a
  * duplicated window back to the token positions it covers (exact
  * substring dedup).
  *
  * Three deliberate contract differences from the set kernel:
  *
  *  - docs shorter than n emit an EMPTY array, not one short-window
  *    hash — a document that cannot contain an n-token span must not
  *    join a span against the corpus;
  *  - the hash is computed by a ROLLING update (drop the leading
  *    term, shift, admit the next token) so the kernel is O(len) for
  *    ANY window width — the fold form is O(len·n), a 50× rescan of
  *    the token mass at the Lee-et-al-style n = 50;
  *  - the value is a 60-BIT DOUBLE HASH `h131·P + h137` (two rolling
  *    residues over the same token hashes, multipliers 131 and 137),
  *    not the set kernel's single 30-bit residue. A single mod-P
  *    residue collides birthday-style at spurious ≈ m²/2P over m
  *    windows — measured: a corpus of 285M windows with ZERO real
  *    duplication manufactured ~40M spurious "duplicated" starts,
  *    and irreversible REMOVAL amplifies every collision into lost
  *    text (`bench_evidence/r13_substring_hash_anchor.txt`). At 60
  *    bits the same corpus expects ≪ 1 spurious pair. The set kernel
  *    keeps its int32 trade (half the shuffle width) because its
  *    consumers verify candidates downstream with exact set ops;
  *    removal has no downstream check, so it pays for the width.
  */
case class WordShingleHashesPos(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1 && n <= 256,
    s"word_shingle_hashes_pos supports n in [1,256], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes_pos expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingleHashesPos.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordShingleHashesPos.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashesPos {
  private val P = 1000000007L

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val k = tokens.numElements()
    if (k < n) return org.apache.spark.sql.catalyst.expressions
      .UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](k)
    var i = 0
    while (i < k) {
      th(i) = Md5Prefix60.compute(tokens.getUTF8String(i).getBytes) % P
      i += 1
    }
    val m = k - n + 1
    val out = new Array[Long](m)
    // multiplier^(n-1) mod P — each fold's leading-term weight
    var pw1 = 1L; var pw2 = 1L
    var e = 0
    while (e < n - 1) { pw1 = pw1 * 131L % P; pw2 = pw2 * 137L % P; e += 1 }
    var a1 = 0L; var a2 = 0L
    var j = 0
    while (j < n) {
      a1 = (a1 * 131L + th(j)) % P
      a2 = (a2 * 137L + th(j)) % P
      j += 1
    }
    out(0) = a1 * P + a2
    i = 1
    while (i < m) {
      // drop the leading term, shift, admit the next token; every
      // intermediate < P² < 2⁶⁰, no overflow (and h131·P + h137 <
      // (P-1)·P + P < 2⁶⁰ fits the BIGINT the oracle computes)
      a1 = (a1 - th(i - 1) * pw1 % P + P) % P
      a1 = (a1 * 131L + th(i + n - 1)) % P
      a2 = (a2 - th(i - 1) * pw2 % P + P) % P
      a2 = (a2 * 137L + th(i + n - 1)) % P
      out(i) = a1 * P + a2
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def apply(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingleHashesPos(
      GraftColumnBridge.expression(tokens), n))
}

/** 60-bit double-hash form of the [[WordShingleHashes]] SET kernel
  * (distinct sorted `h131·P + h137` per window, same short-doc
  * single-window rule) — for consumers whose OUTPUT is the hash-equal
  * pair itself with no downstream exact verification
  * ([[graft.operators.Dedup.sharedSpanPairs]]): at m distinct spans a
  * single 30-bit residue reports ≈ m²/2P spurious pairs — ~262k at
  * the 23M-span decade, comparable to the real pair count — while the
  * minhash/Jaccard family keeps the int32 kernel because exact set
  * ops verify its candidates downstream (collisions only perturb a
  * ratio by ~1/P there).
  */
case class WordShingleHashes64(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1 && n <= 256,
    s"word_shingle_hashes64 supports n in [1,256], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes64 expects array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    WordShingleHashes64.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordShingleHashes64.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes64 {
  private val P = 1000000007L

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val k = tokens.numElements()
    val th = new Array[Long](k)
    var i = 0
    while (i < k) {
      th(i) = Md5Prefix60.compute(tokens.getUTF8String(i).getBytes) % P
      i += 1
    }
    val m = math.max(k - n + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var a1 = 0L; var a2 = 0L
      var j = i
      val end = math.min(i + n, k)
      while (j < end) {
        a1 = (a1 * 131L + th(j)) % P
        a2 = (a2 * 137L + th(j)) % P
        j += 1
      }
      out(i) = a1 * P + a2
      i += 1
    }
    Arrays.sort(out)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Arrays.copyOf(out, w))
  }

  def apply(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingleHashes64(
      GraftColumnBridge.expression(tokens), n))
}
