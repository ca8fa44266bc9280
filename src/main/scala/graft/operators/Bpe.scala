package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Byte-pair-encoding subword learning (Sennrich et al., ACL 2016)
  * re-expressed for Spark's execution model.
  *
  * The classic efficiency argument carries straight over to 100 TB:
  * BPE is learned from the WORD-FREQUENCY TABLE, not the corpus — so
  * the single corpus-sized pass is the word count (one map-combined
  * groupBy), and every one of the N merge iterations runs over the
  * vocabulary table (Heaps-law-sized: millions of rows where the
  * corpus has trillions of tokens). Per iteration: one pair-count
  * aggregate (map-side combined, weighted by word frequency), a 1-row
  * argmax collect, and a map-only [[graft.expressions.MergeAdjacent]]
  * pass updating the symbol sequences. Determinism: argmax ties break
  * lexicographically on the pair, so replays agree.
  */
object Bpe {

  /** One corpus pass: (word, n) frequency table over the whitespace
    * tokenization. The ONLY corpus-sized stage of BPE learning.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(T.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Adjacent-pair counts over current symbol sequences, weighted by
    * word frequency: the argmax input of one merge iteration.
    * `syms` must have columns (syms: array<string>, n: long).
    */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.select(col("n"), col("syms"), posexplode(col("syms")).as(Seq("__i", "a")))
      .withColumn("b", // posexplode is 0-based; NULL past the end
        expr("try_element_at(syms, __i + 2)"))
      .where(col("b").isNotNull)
      .groupBy("a", "b").agg(sum(col("n")).as("count"))

  /** Character symbol sequences of the word table: the iteration-0
    * state (every character its own symbol; no end-of-word marker —
    * a documented simplification, the merge dynamics are identical).
    */
  def charSyms(words: DataFrame): DataFrame =
    words.select(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"),
      col("n"))

  /** Learn `nMerges` BPE merges from the corpus. Returns the ordered
    * merge list (rank, a, b) — rank 0 learned first. Driver holds one
    * (a, b) pair per iteration; the vocab table is cached and
    * checkpoint-compacted every few iterations so lineage stays flat.
    */
  def trainMerges(docs: DataFrame, textCol: String,
      nMerges: Int): Seq[(Int, String, String)] = {
    require(nMerges >= 1, s"nMerges=$nMerges")
    var syms = charSyms(wordTable(docs, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    try {
      var r = 0
      var exhausted = false
      while (r < nMerges && !exhausted) {
        // deterministic argmax: count desc, then pair lexicographically
        val top = pairCounts(syms)
          .orderBy(desc("count"), col("a"), col("b")).limit(1)
          .select(col("a"), col("b")).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((r, a, b))
          val next = syms.select(
            graft.expressions.MergeAdjacent.merge(col("syms"), a, b).as("syms"),
            col("n"))
          val mat =
            if ((r + 1) % 8 == 0) next.localCheckpoint(true)
            else next.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          syms.unpersist(blocking = false)
          syms = mat
          r += 1
        }
      }
    } finally syms.unpersist(blocking = false)
    merges.toSeq
  }

  /** Encode words with a learned merge list: apply every merge in
    * rank order (the standard encode — greedy in learned priority).
    * Map-only: the merge list rides along as nMerges chained
    * [[graft.expressions.MergeAdjacent]] kernels. Adds/overwrites a
    * `syms` column; every input column survives.
    */
  def applySyms(words: DataFrame,
      merges: Seq[(Int, String, String)]): DataFrame =
    merges.sortBy(_._1).foldLeft(words.withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))) {
      case (df, (_, a, b)) =>
        df.withColumn("syms",
          graft.expressions.MergeAdjacent.merge(col("syms"), a, b))
    }

  /** Per-document subword token counts under a learned merge list —
    * the "how many BPE tokens is my corpus" accounting every training
    * run needs, with the REAL learned merges instead of a heuristic.
    * Encode runs on the DISTINCT-word table (vocab-sized); documents
    * join back on the word — so the corpus pays one explode + one
    * equi-join, never a per-doc encode. Docs with no words survive
    * with zero counts.
    */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String)]): DataFrame = {
    val docWords = docs.select(col(idCol),
        explode(T.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
    val vocab = applySyms(docWords.select("word").distinct(), merges)
      .select(col("word"), size(col("syms")).as("__nsub"))
    val agg = docWords.join(vocab, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__nsub").cast("long")).as("bpe_tokens"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"))
  }
}
