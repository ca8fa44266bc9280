package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE learning against hand-computed merges on a tiny corpus, plus
  * the structural properties: determinism, vocab-side iteration,
  * non-overlapping merge semantics.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges learns the hand-computed merges (Sennrich-style corpus)") {
    // word table: low x5, lowest x2 -> pair counts at iteration 0:
    // (l,o)=7 (w in low+lowest), (o,w)=7, (w,e)=2, (e,s)=2, (s,t)=2
    // argmax ties (l,o)=(o,w)=7 break lexicographically -> (l,o) first
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lowest").mkString(" "))).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 4)
    assert(merges.take(2) == Seq((0, "l", "o"), (1, "lo", "w")))
    // after (l,o) and (lo,w): "low" is one symbol; next pairs are the
    // lowest suffix: (low,e)=2, (e,s)=2, (s,t)=2 -> lexicographic on
    // ties: (e,s) < (low,e) < (s,t)
    assert(merges(2) == ((2, "e", "s")))
    // determinism: an identical run learns identical merges
    assert(Bpe.trainMerges(docs, "text", 4) == merges)
    // encode with the learned merges: "low" collapses to one symbol
    val enc = Bpe.applySyms(Seq(("low", 1L), ("lowest", 1L)).toDF("word", "n"),
        merges.take(2))
      .select(col("syms")).as[Seq[String]].collect().toSet
    assert(enc.contains(Seq("low")))
    assert(enc.contains(Seq("low", "e", "s", "t")))
    // per-doc accounting: 2 merges -> low = 1 subword, lowest = 4
    val counts = Bpe.subwordCounts(
      Seq((1L, "low low lowest"), (2L, ""), (3L, "low")).toDF("doc_id", "text"),
      "doc_id", "text", merges.take(2))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(counts.toSeq == Seq((1L, 3L, 6L), (2L, 0L, 0L), (3L, 1L, 1L)))
  }

  test("MergeAdjacent: left-to-right non-overlapping, 'aaa' -> ['aa','a']") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("x", "a", "a", "y", "a", "a")),
      (3L, Seq("b")),
      (4L, Seq.empty[String])).toDF("id", "syms")
    val out = df.select($"id",
        graft.expressions.MergeAdjacent.merge($"syms", "a", "a").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("aa", "a"))
    assert(out(2L) == Seq("x", "aa", "y", "aa"))
    assert(out(3L) == Seq("b"))
    assert(out(4L) == Seq.empty[String])
  }

  test("pairCounts weights by word frequency and skips word boundaries") {
    val syms = Seq(
      (Seq("a", "b", "c"), 3L),
      (Seq("b", "c"), 2L)).toDF("syms", "n")
    val out = Bpe.pairCounts(syms)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(("a", "b", 3L), ("b", "c", 5L)))
  }
}
