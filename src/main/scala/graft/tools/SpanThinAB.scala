package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Real-corpus A/B for the round-14 df-thinning swap: the convicted
  * count-over-window forms vs the skew-safe groupBy + sliver-join
  * forms ([[Dedup.dropOverCapKeys]] / [[Dedup.keepDuplicatedKeys]]),
  * on the REAL span tables the two operators build (the synthetic
  * [[ViralSkewProbe]] convicts the window form under a planted viral
  * key; this probe prices the swap on realistic Zipf/Heaps-shaped
  * data where no key is viral — the common case the old form was
  * 2× better at in round 13's SpanProbe measurement).
  *
  * Output identity is asserted per form pair: same surviving row
  * count AND same order-insensitive checksum (Σ over rows of a 64-bit
  * row hash) — the swap must be checksum-identical, not just
  * cardinality-identical.
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.SpanThinAB'
  * }}}
  */
object SpanThinAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[span-thin-ab] dir=$dir docs=${docs.count()} cpus=$cpus")

    // the two operators' real span tables
    val pairSpans = docs.select(col("doc_id").as("__id"),
      explode(graft.expressions.WordShingleHashes64(
        graft.functions.TextFunctions.tokens(col("text")), 20)).as("__h"))
    val subWins = docs
      .select(col("doc_id").as("__id"),
        graft.functions.TextFunctions.tokens(col("text")).as("__toks"))
      .select(col("__id"),
        posexplode(graft.expressions.WordShingleHashesPos(col("__toks"), 50))
          .as(Seq("__p", "__h")))

    // columns sorted by NAME: the using-column join forms put __h
    // first where the window forms keep input order — same content,
    // different column order, and xxhash64 is order-sensitive
    def sig(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(df.columns.sorted.map(col): _*).cast("decimal(38,0)")))
        .collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }
    def timed2(f: => (Long, String)): (Double, Double, (Long, String)) = {
      val t0 = System.nanoTime(); val s1 = f
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime(); val s2 = f
      val t3 = (System.nanoTime() - t2) / 1e9
      assert(s1 == s2, s"reps disagree: $s1 vs $s2")
      (t1, t3, s1)
    }

    val (cw1, cw2, sigCW) =
      timed2(sig(Dedup.dropOverCapKeysWindowed(pairSpans, 64)))
    val (cg1, cg2, sigCG) = timed2(sig(Dedup.dropOverCapKeys(pairSpans, 64)))
    require(sigCW == sigCG,
      s"cap thinning forms differ on real data: $sigCW vs $sigCG")
    val (ow1, ow2, sigOW) =
      timed2(sig(Dedup.keepDuplicatedKeysWindowed(subWins, 2)))
    val (og1, og2, sigOG) = timed2(sig(Dedup.keepDuplicatedKeys(subWins, 2)))
    require(sigOW == sigOG,
      s"minocc thinning forms differ on real data: $sigOW vs $sigOG")
    println(f"""{"cap_window_s":[$cw1%.2f,$cw2%.2f],"cap_group_s":[$cg1%.2f,$cg2%.2f],"cap_sig":[${sigCW._1},${sigCW._2}],"occ_window_s":[$ow1%.2f,$ow2%.2f],"occ_group_s":[$og1%.2f,$og2%.2f],"occ_sig":[${sigOW._1},${sigOW._2}]}""")
    spark.stop()
  }
}
