package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Sampling}
import graft.streaming.StatsMaintenance

/** Decade anchor for the SEVENTH (per-source tallies → mix plan /
  * UniMax allocation) and EIGHTH (quality histogram → corpus-relative
  * quantile threshold) maintained shapes under the two adversaries the
  * gates never planted:
  *
  *  - ADVERSARY 1, source skew: ONE source carries 99% of the corpus
  *    mass (the 1000-executor reality: a crawl dwarfs every curated
  *    set). The tallies fold daily, a day retracts, and BOTH consumers
  *    — [[graft.operators.Sampling.mixPlanWith]] and
  *    [[graft.operators.Sampling.unimaxAllocWith]] across a budget
  *    sweep — must be IDENTICAL from the maintained table vs the
  *    survivors' recompute, with the allocator's conservation/cap
  *    invariants checked at every budget. Scale note: the shape is
  *    safe BY CONSTRUCTION (the corpus-scale pass is one partial-agged
  *    groupBy on `source`; the skewed key concentrates a count+two
  *    sums, not rows — map-side combine absorbs it), which is exactly
  *    what this probe demonstrates by measuring the fold wall.
  *
  *  - ADVERSARY 2, quality concentration: 99% of documents land in ONE
  *    per-mille bucket — the worst case for the ties-at-threshold rule
  *    ([[graft.operators.Sampling.quantileThresholdWith]]'s kept set
  *    legitimately inflates from keepPm to ~99%). The histogram folds
  *    daily, a day retracts, and across a keepPm sweep the maintained
  *    threshold must equal the recompute's AND satisfy the rule's own
  *    definition (largest q* with ceil-target coverage, checked
  *    against the classified corpus itself).
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.SelectionSkewProbe'
  * }}}
  */
object SelectionSkewProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    def tmp(n: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-selskew-$n").toString
    def rows(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    // ===== ADVERSARY 1: one source = 99% of the corpus mass =====
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"),
        when(pmod(col("doc_id"), lit(100L)) < 99L, lit("megacrawl"))
          .otherwise(concat(lit("tail_"),
            pmod(col("doc_id"), lit(19L)).cast("string"))).as("source"))
    val days = (0 to 6).map(d => docs.where(col("doc_id") % 7 === d))
    println(s"[sel-skew] dir=$dir docs=${docs.count()} " +
      "adversary1=99%-single-source")

    val talPath = tmp("tallies")
    def foldTallies(day: Int): Boolean =
      StatsMaintenance.foldBatch(days(day), day.toLong, talPath,
        Seq("source"), Seq("n_docs", "n_tokens", "char_mass"),
        b => CorpusStats.sourceTallies(b, "source", "text", "n_chars"))
    var t0 = System.nanoTime()
    (0 to 6).foreach(d => require(foldTallies(d), s"tallies day $d"))
    StatsMaintenance.retractBatch(spark, talPath,
      CorpusStats.sourceTallies(days(1), "source", "text", "n_chars"),
      Seq("source"), Seq("n_docs", "n_tokens", "char_mass"))
    println(f"[sel-skew] tallies: 7 folds + day-1 retraction " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")

    val survivors = docs.where(col("doc_id") % 7 =!= 1)
    val talRe = CorpusStats.sourceTallies(survivors, "source", "text",
      "n_chars").localCheckpoint(true)
    val talStored = StatsMaintenance.readStats(spark, talPath).get
      .localCheckpoint(true)
    require(rows(talStored) == rows(talRe),
      "maintained tallies drifted from the survivors' recompute " +
        "under 99% source skew")
    require(rows(Sampling.mixPlanWith(talStored)) ==
      rows(Sampling.mixPlanWith(talRe)),
      "mix plan drifted under 99% source skew")
    val skewShare = talRe.where(col("source") === "megacrawl")
      .select(col("n_tokens")).collect()(0).getLong(0)
    val total = talRe.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    println(f"[sel-skew] megacrawl holds ${100.0 * skewShare / total}%.1f%% " +
      s"of $total surviving tokens across " +
      s"${talRe.count()} sources")
    // allocator sweep: identical from maintained state, and the
    // water-filling invariants hold at every budget even when one cap
    // dwarfs the rest (epoch cap 2000pm = each source at most 2 epochs)
    val capacity = talRe
      .agg(sum(expr("2000 * n_tokens DIV 1000"))).collect()(0).getLong(0)
    for (budget <- Seq(total / 100, total / 10, total / 2, total,
        2L * total)) {
      val got = Sampling.unimaxAllocWith(talStored, budget, 2000L)
        .localCheckpoint(true)
      require(rows(got) ==
        rows(Sampling.unimaxAllocWith(talRe, budget, 2000L)),
        s"unimax allocation drifted at budget=$budget")
      val allocSum = got.agg(sum(col("alloc_tokens"))).collect()(0)
        .getLong(0)
      require(allocSum == math.min(budget, capacity),
        s"budget=$budget: allocated $allocSum != " +
          s"min($budget, $capacity)")
      require(got.where(col("alloc_tokens") > col("cap_tokens") ||
          col("alloc_tokens") < 0).isEmpty,
        s"budget=$budget: an allocation broke its cap")
      val mega = got.where(col("source") === "megacrawl")
        .select(col("alloc_tokens")).collect()(0).getLong(0)
      println(f"[sel-skew] budget=$budget%12d alloc=$allocSum%12d " +
        f"megacrawl=$mega%12d (${100.0 * mega / math.max(allocSum, 1)}%.1f%%)")
    }
    println("[sel-skew] ADVERSARY 1 PASS: tallies, mix plan, and the " +
      "allocator sweep identical from maintained state; invariants hold")

    // ===== ADVERSARY 2: 99% of docs in ONE per-mille bucket =====
    val scored = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(100L)) < 99L, lit(500L))
          .otherwise(pmod(col("doc_id"), lit(1001L))).as("quality_pm"))
    val qdays = (0 to 6).map(d => scored.where(col("doc_id") % 7 === d))
    val qPath = tmp("qhist")
    def foldHist(day: Int): Boolean =
      StatsMaintenance.foldBatch(qdays(day), day.toLong, qPath,
        Seq("quality_pm"), Seq("n_docs"),
        b => Sampling.qualityHistogram(b, col("quality_pm")))
    t0 = System.nanoTime()
    (0 to 6).foreach(d => require(foldHist(d), s"hist day $d"))
    StatsMaintenance.retractBatch(spark, qPath,
      Sampling.qualityHistogram(qdays(1), col("quality_pm")),
      Seq("quality_pm"), Seq("n_docs"))
    println(f"[sel-skew] histogram: 7 folds + day-1 retraction " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")

    val qSurvivors = scored.where(col("doc_id") % 7 =!= 1)
      .localCheckpoint(true)
    val histRe = Sampling.qualityHistogram(qSurvivors, col("quality_pm"))
      .localCheckpoint(true)
    val histStored = StatsMaintenance.readStats(spark, qPath).get
      .localCheckpoint(true)
    require(rows(histStored) == rows(histRe),
      "maintained histogram drifted from the survivors' recompute " +
        "under 99% bucket concentration")
    val nBuckets = histRe.count()
    val nDocs = qSurvivors.count()
    val bulk = histRe.where(col("quality_pm") === 500L)
      .select(col("n_docs")).collect()(0).getLong(0)
    println(f"[sel-skew] $nBuckets buckets over $nDocs docs; bucket 500 " +
      f"holds ${100.0 * bulk / nDocs}%.1f%%")
    require(nBuckets <= 1001, s"bucket bound broken: $nBuckets")
    // keepPm sweep across the tie cliff: thresholds identical from
    // maintained state AND each satisfies the rule's own definition
    // against the classified corpus (largest q* whose kept set covers
    // the ceil target; tie inflation is the DOCUMENTED worst case here)
    for (keepPm <- Seq(0L, 1L, 5L, 250L, 500L, 990L, 1000L)) {
      val got = Sampling.quantileThresholdWith(histStored, keepPm)
        .localCheckpoint(true)
      require(rows(got) ==
        rows(Sampling.quantileThresholdWith(histRe, keepPm)),
        s"threshold drifted at keepPm=$keepPm")
      val Array(thr, target, tot2) = got
        .select(col("threshold_pm"), col("target_docs"), col("total_docs"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      require(tot2 == nDocs, s"keepPm=$keepPm: total $tot2 != $nDocs")
      require(target == (keepPm * nDocs + 999) / 1000,
        s"keepPm=$keepPm: target $target is not the ceil")
      val kept = qSurvivors.where(col("quality_pm") >= thr).count()
      if (target == 0) require(thr == 1001L && kept == 0L,
        s"keepPm=$keepPm: nothing-passes sentinel broken (thr=$thr)")
      else {
        require(kept >= target,
          s"keepPm=$keepPm: threshold $thr keeps $kept < target $target")
        val keptAbove = qSurvivors.where(col("quality_pm") > thr).count()
        require(keptAbove < target,
          s"keepPm=$keepPm: $thr is not the LARGEST valid threshold " +
            s"(> $thr already keeps $keptAbove >= $target)")
      }
      println(f"[sel-skew] keepPm=$keepPm%4d thr=$thr%4d target=$target%7d " +
        f"kept=$kept%7d (${100.0 * kept / nDocs}%.1f%% - tie inflation " +
        s"${if (kept > target * 2) "EXTREME (adversary working)" else "mild"})")
    }
    println("[sel-skew] ADVERSARY 2 PASS: thresholds identical from " +
      "maintained state and rule-exact at every keepPm, including " +
      "across the 99% tie cliff")

    println("[sel-skew] ALL PASS")
    spark.stop()
  }
}
