package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The UniMax water-filling allocator
  * ([[Sampling.unimaxAllocWith]]): the closed-form (capped prefix +
  * level + deterministic remainder) must equal the paper's sequential
  * smallest-first loop on every fixture, and the allocation invariants
  * must hold at the edges.
  */
class MixPlanSpec extends SparkSpec {
  import spark.implicits._

  /** The paper's sequential algorithm (UniMax, Chung et al. 2023,
    * Algorithm 1), integer arithmetic: visit sources smallest-cap
    * first; each takes min(cap, uniform share of remaining budget),
    * where the share is the integer level and the division remainder
    * goes +1 to the first r uncapped ranks — the same deterministic
    * tie-break the operator documents.
    */
  private def sequential(tbl: Seq[(String, Long)], budget: Long,
      epochsPm: Long): Map[String, Long] = {
    val sorted = tbl.map { case (s, n) => (s, n, epochsPm * n / 1000) }
      .sortBy { case (s, _, cap) => (cap, s) }
    var rem = budget
    var left = sorted.size
    val out = scala.collection.mutable.Map[String, Long]()
    var i = 0
    var capped = true
    var level = 0L
    var extra = 0L
    var uncappedRank = 0L
    sorted.foreach { case (s, _, cap) =>
      if (capped && cap * left < rem) {
        out(s) = cap; rem -= cap; left -= 1
      } else {
        if (capped) { capped = false; level = rem / left; extra = rem % left }
        out(s) = level + (if (uncappedRank < extra) 1L else 0L)
        uncappedRank += 1
      }
      i += 1
    }
    out.toMap
  }

  private def alloc(tbl: Seq[(String, Long)], budget: Long,
      epochsPm: Long): Map[String, Long] =
    Sampling.unimaxAllocWith(
        tbl.toDF("source", "n_tokens"), budget, epochsPm)
      .select("source", "alloc_tokens")
      .as[(String, Long)].collect().toMap

  private val fixtures: Seq[Seq[(String, Long)]] = Seq(
    Seq("a" -> 100L, "b" -> 1000L, "c" -> 10000L, "d" -> 100000L),
    Seq("a" -> 7L, "b" -> 7L, "c" -> 7L),               // ties
    Seq("solo" -> 500L),
    Seq("zero" -> 0L, "tiny" -> 3L, "big" -> 999983L),  // empty source
    (1 to 17).map(i => s"s$i" -> (i * i * 13L + 1))
  )

  test("closed form equals the paper's sequential loop across " +
    "fixtures, budgets, and epoch caps") {
    for {
      tbl <- fixtures
      total = tbl.map(_._2).sum
      budget <- Seq(0L, 1L, total / 10, total / 2, total - 1,
        total, 2 * total, 5 * total + 3)
      epochsPm <- Seq(500L, 1000L, 2000L, 3500L)
    } {
      val got = alloc(tbl, budget, epochsPm)
      val want = sequential(tbl, budget, epochsPm)
      assert(got == want,
        s"closed form drifted from sequential: tbl=$tbl budget=$budget " +
          s"epochsPm=$epochsPm got=$got want=$want")
      // invariants: exact budget conservation and per-source caps
      val caps = tbl.map { case (s, n) => s -> epochsPm * n / 1000 }.toMap
      assert(got.values.sum == math.min(budget, caps.values.sum),
        s"sum must be min(budget, total capacity): $got")
      got.foreach { case (s, a) =>
        assert(a >= 0 && a <= caps(s), s"alloc out of [0, cap] for $s: $a")
      }
    }
  }

  test("remainder lands on the first uncapped ranks in (cap, source) " +
    "order - deterministic, never exceeding a cap") {
    // budget 10 over three equal sources of cap 4: level 3, remainder 1
    // -> ranks (a, b, c): a gets 4 (3+1), b and c get 3
    val got = alloc(Seq("c" -> 4000L, "a" -> 4000L, "b" -> 4000L), 10L, 1L)
    assert(got == Map("a" -> 4L, "b" -> 3L, "c" -> 3L), got.toString)
  }

  test("epoch cap binds the small sources and the level splits the " +
    "rest (the UniMax failure-mode split)") {
    val tbl = Seq("rare" -> 100L, "mid" -> 10000L, "crawl" -> 1000000L)
    val got = Sampling.unimaxAllocWith(
        tbl.toDF("source", "n_tokens"), budget = 500000L, epochsPm = 2000L)
      .select("source", "cap_tokens", "alloc_tokens", "alloc_epochs_pm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // rare and mid bind at 2 epochs of their own mass; crawl absorbs
    // the rest at well under one epoch
    assert(got("rare") == ((200L, 200L, 2000L)), got.toString)
    assert(got("mid") == ((20000L, 20000L, 2000L)), got.toString)
    assert(got("crawl") == ((2000000L, 479800L, 479L)), got.toString)
  }

  test("quantile threshold from the quality histogram: ceil target, " +
    "tie inflation, and the 0/1000 edges") {
    // ten docs, quality 0, 100, ..., 900 - one per bucket
    val docs = (0 until 10).map(i => (i.toLong, i.toLong * 100))
      .toDF("doc_id", "q")
    val hist = Sampling.qualityHistogram(docs, col("q"))
    def thr(keep: Long): (Long, Long, Long) =
      Sampling.quantileThresholdWith(hist, keep)
        .as[(Long, Long, Long)].collect()(0)
    // top 25% of 10 docs: target ceil(2.5) = 3 -> q* = 700 (900, 800,
    // 700 pass)
    assert(thr(250) == ((700L, 3L, 10L)), thr(250).toString)
    assert(thr(1) == ((900L, 1L, 10L)))     // at least one doc
    assert(thr(1000) == ((0L, 10L, 10L)))   // everything passes
    assert(thr(0) == ((1001L, 0L, 10L)))    // nothing passes
    // ties at the threshold bucket inflate the kept set: 5 docs at
    // 900, 5 at 500; keep 30% -> target 3, but the 900-bucket alone
    // has 5 -> threshold 900 keeps all five
    val tied = ((0 until 5).map(i => (i.toLong, 900L)) ++
      (5 until 10).map(i => (i.toLong, 500L))).toDF("doc_id", "q")
    val tiedThr = Sampling.quantileThresholdWith(
        Sampling.qualityHistogram(tied, col("q")), 300L)
      .as[(Long, Long, Long)].collect()(0)
    assert(tiedThr == ((900L, 3L, 10L)), tiedThr.toString)
    // empty histogram: nothing passes, totals zero
    val empty = Sampling.quantileThresholdWith(
        Sampling.qualityHistogram(docs.where(col("q") < 0), col("q")), 500L)
      .as[(Long, Long, Long)].collect()(0)
    assert(empty == ((1001L, 0L, 0L)), empty.toString)
  }

  test("the per-mille contract is ENFORCED: a raw (unquantized) score " +
    "outside [0, 1000] fails the histogram loudly instead of unbounding " +
    "the 1001-bucket claim or satisfying the nothing-passes sentinel") {
    def hist(qs: Seq[Long]) = Sampling.qualityHistogram(
      qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
        .toDF("doc_id", "q"), col("q"))
    // 1001 would make quantileThresholdWith's nothing-passes sentinel
    // satisfiable; a raw score (e.g. 87432) would unbound the buckets
    for (bad <- Seq(Seq(500L, 1001L), Seq(-1L, 3L), Seq(87432L))) {
      val e = intercept[Exception] { hist(bad).collect() }
      assert(e.getMessage.contains("per-mille"),
        s"expected the contract error for $bad, got: ${e.getMessage}")
    }
    // NULL scores are a contract violation too, not a silent bucket
    val withNull = Seq((0L, Some(500L)), (1L, None)).toDF("doc_id", "q")
    val eNull = intercept[Exception] {
      Sampling.qualityHistogram(withNull, col("q")).collect()
    }
    assert(eNull.getMessage.contains("per-mille"), eNull.getMessage)
    // the likeliest upstream mistake: an UNQUANTIZED 0..1 fraction.
    // cast("long") would truncate it to an in-range 0 and collapse the
    // histogram — the integrality check must catch it
    val fractional = Seq((0L, 0.25), (1L, 0.9)).toDF("doc_id", "q")
    val eFrac = intercept[Exception] {
      Sampling.qualityHistogram(fractional, col("q")).collect()
    }
    assert(eFrac.getMessage.contains("per-mille"), eFrac.getMessage)
    // integral doubles are fine (the quantizer may emit double-typed
    // per-milles); the histogram key is still a long
    assert(Sampling.qualityHistogram(
      Seq((0L, 250.0), (1L, 250.0)).toDF("doc_id", "q"), col("q"))
      .as[(Long, Long)].collect().toSeq == Seq((250L, 2L)))
    // the full legal range still folds
    assert(hist((0L to 1000L)).count() == 1001L)
  }

  test("the quality histogram is additive and retractable (eighth " +
    "maintained shape contract)") {
    val all = (0 until 40).map(i => (i.toLong, (i % 7).toLong * 150))
      .toDF("doc_id", "q")
    val parts = (0 to 3).map(r =>
      Sampling.qualityHistogram(all.where(col("doc_id") % 4 === r),
        col("q")))
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.as[(Long, Long)].collect().toMap
    val merged = CorpusStats.mergeStats(parts,
      Seq("quality_pm"), Seq("n_docs"))
    assert(m(merged) == m(Sampling.qualityHistogram(all, col("q"))))
    val retracted = CorpusStats.retractStats(merged, parts(1),
      Seq("quality_pm"), Seq("n_docs"))
    assert(m(retracted) == m(Sampling.qualityHistogram(
      all.where(col("doc_id") % 4 =!= 1), col("q"))))
  }
}
