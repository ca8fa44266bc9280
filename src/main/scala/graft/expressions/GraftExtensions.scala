package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT graft_vector_dot(a, b) ...")` works alongside
  * the Column API. Install either per session via [[register]] or at
  * build time with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_vector_dot",
      info("graft_vector_dot", "dot product of two float/double arrays (double fold)"),
      (args: Seq[Expression]) => VectorDotProduct(args(0), args(1))),
    ("graft_rolling_hash",
      info("graft_rolling_hash", "polynomial rolling hash mod 1e9+7"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    ("graft_simhash",
      info("graft_simhash", "simhash over an array of int64 token hashes"),
      (args: Seq[Expression]) => SimHashBits(args.head, 16)),
    ("graft_sorted_jaccard",
      info("graft_sorted_jaccard", "jaccard of two sorted distinct int64 arrays"),
      (args: Seq[Expression]) => SortedArrayJaccard(args(0), args(1))),
    ("graft_lang_guess",
      info("graft_lang_guess", "function-word language-ID heuristic"),
      (args: Seq[Expression]) => LangGuess(args.head)),
    ("graft_line_stats",
      info("graft_line_stats",
        "fused line/symbol quality signals (Gopher-rule inputs): " +
          "struct<n_lines, n_dup_lines, dup_line_chars, line_chars, " +
          "n_bullet, n_ellipsis, n_alpha_toks, n_sym_hits>"),
      (args: Seq[Expression]) => LineStats(args.head)),
    ("graft_md5_prefix60",
      info("graft_md5_prefix60", "first 60 bits of md5 as int64 (portable hash)"),
      (args: Seq[Expression]) => Md5Prefix60(args.head)),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes",
        "sorted distinct word n-gram shingle hashes of a token array; n in [1,5] (int literal)"),
      (args: Seq[Expression]) => args(1).eval() match {
        case n: Int => WordShingleHashes(args.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_shingle_hashes: n must be an INT literal, got $other")
      }),
    ("graft_shingle_hashes_pos",
      info("graft_shingle_hashes_pos",
        "positional word n-gram window hashes (60-bit double hash, " +
          "rolling O(len) at any width; empty for docs shorter than n); " +
          "n in [1,256] (int literal)"),
      (args: Seq[Expression]) => args(1).eval() match {
        case n: Int => WordShingleHashesPos(args.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_shingle_hashes_pos: n must be an INT literal, got $other")
      }),
    ("graft_shingle_hashes64",
      info("graft_shingle_hashes64",
        "sorted distinct 60-bit double-hash word n-gram shingles " +
          "(for pairing with no downstream verify); n in [1,256] (int literal)"),
      (args: Seq[Expression]) => args(1).eval() match {
        case n: Int => WordShingleHashes64(args.head, n)
        case other => throw new IllegalArgumentException(
          s"graft_shingle_hashes64: n must be an INT literal, got $other")
      }),
    ("graft_minhash_bands",
      info("graft_minhash_bands",
        "LSH band keys (\"b:s:s\") from a hashed shingle set in one fused " +
          "scan; args: set array<bigint>, k (int literal), rowsPerBand " +
          "(int literal), k a multiple of rowsPerBand"),
      (args: Seq[Expression]) => (args(1).eval(), args(2).eval()) match {
        case (k: Int, r: Int) => MinHashBands(args.head, k, r)
        case other => throw new IllegalArgumentException(
          s"graft_minhash_bands: k and rowsPerBand must be INT literals, got $other")
      }),
    ("graft_percentile_cm",
      info("graft_percentile_cm",
        "exact interpolated percentiles of a bounded-cardinality double column " +
          "(primitive count-map aggregate); trailing args are percentage literals, " +
          "returns array<double>"),
      (args: Seq[Expression]) => {
        val ps = args.tail.map(_.eval() match {
          case d: Double => d
          case f: Float => f.toDouble
          case i: Int => i.toDouble
          case l: Long => l.toDouble
          case s: Short => s.toDouble
          case b: Byte => b.toDouble
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_percentile_cm: percentages must be numeric literals, got $other")
        })
        CountMapPercentile(args.head, ps)
      }))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
