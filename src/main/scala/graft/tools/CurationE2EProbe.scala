package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** End-to-end decade gate for [[graft.operators.Curation.curate]] with
  * EVERY optional stage on (C4 → corpus line dedup → exact dedup →
  * LSH near-dedup + survivors → token-budget cut → mix → pack) at the
  * 500k-doc Zipf corpus:
  *
  *  - wall, with and without `persistStages` (the multi-scan bill:
  *    downstream stages lazily re-derive the whole upstream chain);
  *  - an exactness gate: the two variants must be checksum-IDENTICAL,
  *    and so must a replay on re-partitioned, re-ordered input
  *    (partitioning independence);
  *  - structural invariants that prove real work: no duplicate
  *    instance ids, per-shard packing offsets reconcile with token
  *    sums, budget respected pre-mixing, planted boilerplate gone.
  *
  * {{{
  * CURATE_DIR=target/testdata/sf10z sbt 'runMain graft.tools.CurationE2EProbe'
  * }}}
  */
object CurationE2EProbe {
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
    import spark.implicits._

    val dir = sys.env.getOrElse("CURATE_DIR", "target/testdata/sf10z")
    // lined rendition (the corpora ship one text blob per doc) + planted
    // cross-doc boilerplate the line-dedup stage must strip
    val lines0 = transform(
      graft.functions.TextFunctions.tokenChunks(col("text"), 8, 8),
      c => concat(array_join(c.getField("toks"), " "), lit(".")))
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        concat(
          when(col("doc_id") % 3 === 0,
            lit("subscribe to our newsletter today for offers.\n"))
            .otherwise(lit("")),
          array_join(lines0, "\n"),
          when(col("doc_id") % 5 === 0,
            lit("\nall rights reserved by the site owner."))
            .otherwise(lit(""))).as("text"))
    val n = docs0.count()
    val tokenBudget = n * 30L
    println(s"[curate-e2e] dir=$dir docs=$n tokenBudget=$tokenBudget")

    def runCurate(in: DataFrame, persist: Boolean): Curation.StagedCuration =
      Curation.curateStaged(in, "doc_id", "text", "source",
        mixPerMille = Map("src3" -> 2500, "src7" -> 300, "src11" -> 0),
        budget = 2048, nShards = 64,
        lineDedupMaxDf = Some(10),
        tokenBudget = Some(tokenBudget),
        quality = pmod(col("doc_id"), lit(7L)), // 7 strata, deterministic
        persistStages = persist)

    def summarize(label: String, in: DataFrame, persist: Boolean)
        : (Double, Seq[Long]) = {
      // deterministic per-run cache ownership via the round-12 handle
      // (replaces the session-wide clearCache workaround)
      val t0 = System.nanoTime()
      val run = runCurate(in, persist)
      val s = run.result.agg(
        count(lit(1)),
        countDistinct(col("instance_id")),
        sum(conv(md5(concat_ws("|", col("instance_id"), col("doc_id"),
          col("copy"), col("source"), col("shard"), col("n_tokens"),
          col("token_offset"), col("bin_first"), col("bin_last"),
          col("straddles"))).substr(1, 8), 16, 10).cast("long")),
        sum(conv(md5(col("clean_text")).substr(1, 8), 16, 10).cast("long")),
        sum(when(col("clean_text").contains("subscribe to our newsletter") ||
          col("clean_text").contains("all rights reserved"), 1L)
          .otherwise(0L)),
        countDistinct(col("doc_id")),
        sum(col("n_tokens"))).as[(Long, Long, Long, Long, Long, Long, Long)]
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      run.close()
      println(f"[curate-e2e] $label: wall=$wall%.1f s instances=${s._1} " +
        f"docs=${s._6} tokens=${s._7} boilerplate_survivors=${s._5}")
      require(s._1 == s._2, "duplicate instance ids")
      require(s._5 == 0L, "planted boilerplate survived")
      (wall, Seq(s._1, s._2, s._3, s._4, s._5, s._6, s._7))
    }

    val (wCold, a) = summarize("persistStages=false", docs0, persist = false)
    val (wWarm, b) = summarize("persistStages=true ", docs0, persist = true)
    require(a == b, s"persistStages changed the OUTPUT: $a vs $b")
    // partitioning / input-order independence
    val shuffled = docs0.repartition(7, col("source")).orderBy(desc("doc_id"))
    val (wShuf, c) = summarize("reordered input     ", shuffled, persist = true)
    require(a == c, s"input partitioning changed the OUTPUT: $a vs $c")
    println(f"[curate-e2e] persist speedup: ${wCold / wWarm}%.2fx " +
      f"(cold $wCold%.1f s -> staged $wWarm%.1f s; reordered $wShuf%.1f s)")

    // packing reconciliation: per shard, max(offset)+its n_tokens == sum(n_tokens)
    val lastRun = runCurate(docs0, persist = true)
    val out = lastRun.result
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
    val bad = out.select(col("shard"), col("n_tokens"), col("token_offset"),
        max(col("token_offset") + col("n_tokens")).over(w).as("__end"),
        sum(col("n_tokens")).over(w).as("__sum"))
      .where(col("__end") =!= col("__sum")).count()
    require(bad == 0L, s"packing offsets do not reconcile: $bad rows")
    // budget respected pre-mixing: distinct docs' token sum <= budget
    val docTok = out.select(col("doc_id"), col("n_tokens")).distinct()
      .agg(sum("n_tokens")).as[Long].head()
    require(docTok <= tokenBudget,
      s"distinct-doc tokens $docTok exceed budget $tokenBudget")
    println(f"[curate-e2e] packing reconciled; distinct-doc tokens $docTok%d <= budget")
    lastRun.close()
    println("[curate-e2e] OK")
    spark.stop()
  }
}
