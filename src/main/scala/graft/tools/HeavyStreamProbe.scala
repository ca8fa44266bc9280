package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Decade anchor for [[CorpusStats.heavyHittersOverStream]]'s
  * history-filter leg — the one case the gate corpora only exercise
  * at unit scale: a token heavy across HISTORY but entirely ABSENT
  * from today's batch (the case [[CorpusStats.heavyHittersWith]]'s
  * same-corpus contract provably misses). A synthetic token is
  * planted into the history partition of a real Zipf decade at
  * exactly threshold occurrences and zero batch occurrences; the
  * whole-stream answer computed from the two maintained shapes
  * (exact counts + count-min sketch, both folded from history) must
  * equal the from-scratch threshold count over history ∪ batch by
  * exact set equality — and must contain the planted token.
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.HeavyStreamProbe'
  * }}}
  */
object HeavyStreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    val (depth, width) = (3, 4096) // narrow enough for real collisions
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val total = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("t")).count()
    val threshold = math.max((total + 63L) / 64L, 1L)
    println(s"[heavy-stream] dir=$dir docs=${docs.count()} " +
      s"tokens=$total threshold=$threshold depth=$depth width=$width")

    // history = 3/4 of the corpus PLUS one planted doc that alone
    // carries a token to exactly the threshold; batch = the last
    // quarter, which cannot contain the planted token (it never
    // appears in the generator's vocabulary)
    // the planted doc is built as ONE in-heap string of `threshold`
    // tokens; past ~50M tokens (a ~1 GB string) that stops being a
    // sane driver-side allocation, and threshold.toInt would silently
    // truncate past Int.MaxValue — fail loudly instead of planting
    // fewer occurrences than the probe's own assertion expects
    require(threshold <= 50000000L,
      s"planted-token threshold $threshold too large for a single " +
        "driver-side string - split the planted doc across multiple rows")
    val planted = Seq((-1L,
      Seq.fill(threshold.toInt)("grafthistonlytoken").mkString(" ")))
      .toDF("doc_id", "text")
    val hist = docs.where(col("doc_id") % 4 =!= 3).unionByName(planted)
    val today = docs.where(col("doc_id") % 4 === 3)

    val histBatches = Seq(
      hist.where(pmod(coalesce(col("doc_id"), lit(0L)), lit(2L)) === 0L ||
        col("doc_id") < 0),
      hist.where(pmod(col("doc_id"), lit(2L)) === 1L && col("doc_id") >= 0))
    val histCounts = CorpusStats.mergeStats(
      histBatches.map(CorpusStats.tokenCounts(_, "text")),
      Seq("token"), Seq("n"))
    val sketch = CorpusStats.mergeStats(
      histBatches.map(CorpusStats.countMinSketch(_, "text", depth, width)),
      Seq("d", "bucket"), Seq("n"))

    val t0 = System.nanoTime()
    val got = CorpusStats.heavyHittersOverStream(today, "text",
        histCounts, sketch, depth, width, threshold)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val wall = (System.nanoTime() - t0) / 1e9

    val want = CorpusStats.tokenCounts(hist.unionByName(today), "text")
      .where(col("n") >= threshold)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    require(got == want,
      s"maintained composition drifted from recompute: got ${got.size} " +
        s"rows vs ${want.size}; first diff ${got.diff(want).take(3)} / " +
        s"${want.diff(got).take(3)}")
    require(got.exists(_._1 == "grafthistonlytoken"),
      "planted history-only heavy token missing from the output")
    println(f"[heavy-stream] PASS: ${got.size} heavy tokens == recompute " +
      f"exactly (incl. the planted history-only token at df=$threshold, " +
      f"absent from the batch); maintained-side wall $wall%.1fs")
    spark.stop()
  }
}
