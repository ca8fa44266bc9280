package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Packing}

/** Scale probe for the tokenizer's last mile at a PRODUCTION
  * vocabulary: REAL learned 32k merges pushed through
  * [[graft.operators.Bpe.encodeIds]] →
  * [[graft.operators.Packing.binIdSequences]] at the 500k-doc Zipf
  * decade. Measures the two round-12 extrapolated claims directly:
  *
  *  1. [[graft.expressions.MergeList]]'s O(1)-per-absent-merge
  *     presence probe at 32k merges — the word-encode wall;
  *  2. the symbol→id lookup: the [[graft.expressions.VocabIds]] hash
  *     kernel vs the retired `typedLit`-map `element_at` form, whose
  *     GetMapValue on a literal map is a LINEAR scan per symbol
  *     (O(|vocab|) — invisible at the 10–200-merge gate scale). Both
  *     paths run on the same materialized word-symbol table and must
  *     agree on an id checksum.
  *
  * {{{
  * ENC_DIR=target/testdata/sf10z ENC_MERGES=32000 ENC_MAPLIT=1 \
  *   sbt 'runMain graft.tools.EncodeScaleProbe'
  * }}}
  *
  * ENC_MERGES_CACHE (default target/bpe_merges_cache) persists the
  * learned list so re-runs skip the ~4-minute training;
  * ENC_MAPLIT_CAP caps the merge count used for the map-literal
  * comparison (the retired path at full 32k may be minutes on its
  * own — the cap makes the scan-vs-hash slope measurable in bounded
  * time; set to 0 to skip the capped rung).
  */
object EncodeScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("ENC_DIR", "target/testdata/sf10z")
    val nMerges = sys.env.getOrElse("ENC_MERGES", "32000").toInt
    val cache = sys.env.getOrElse("ENC_MERGES_CACHE",
      s"target/bpe_merges_cache_$nMerges")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[encode-probe] dir=$dir docs=${docs.count()} merges=$nMerges")

    val merges: Seq[(Int, String, String)] =
      if (new java.io.File(s"$cache/_SUCCESS").exists()) {
        val m = spark.read.parquet(cache)
          .select("rank", "a", "b").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
          .sortBy(_._1).toSeq
        println(s"[encode-probe] loaded ${m.size} cached merges from $cache")
        m
      } else {
        val t = System.nanoTime()
        val m = Bpe.trainMergesLocal(docs, "text", nMerges)
        println(f"[encode-probe] trainMergesLocal(${m.size}) " +
          f"wall=${(System.nanoTime() - t) / 1e9}%.1fs")
        import spark.implicits._
        m.toDF("rank", "a", "b").coalesce(1)
          .write.mode("overwrite").parquet(cache)
        m
      }

    val tv = System.nanoTime()
    val vocab = Bpe.vocab(docs, "text", merges)
    println(f"[encode-probe] vocab: ${vocab.size} entries " +
      f"(alphabet ${vocab.size - merges.size}), " +
      f"wall=${(System.nanoTime() - tv) / 1e9}%.1fs")

    // --- claim 1: the MergeList kernel at 32k merges, word-table side
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("word"))
      .where(length(col("word")) > 0).distinct()
    val t1 = System.nanoTime()
    val wordSyms = Bpe.applySyms(words, merges).localCheckpoint(true)
    val wsStats = wordSyms.agg(count(lit(1)), sum(size(col("syms"))))
      .collect()(0)
    val mergeWall = (System.nanoTime() - t1) / 1e9
    println(f"[encode-probe] MergeList over distinct words: " +
      f"${wsStats.getLong(0)} words -> ${wsStats.getLong(1)} symbols, " +
      f"wall=$mergeWall%.1fs at ${merges.size} merges")

    // --- claim 2: symbol->id lookup, hash kernel vs retired map literal
    def lookupChecksum(ids: org.apache.spark.sql.Column): (Double, Long) = {
      val t = System.nanoTime()
      val s = wordSyms.select(ids.as("__ids"))
        .agg(sum(aggregate(col("__ids"), lit(0L),
          (acc, x) => acc + x.cast("long") + 7L)))
        .collect()(0).getLong(0)
      ((System.nanoTime() - t) / 1e9, s)
    }
    val (hashWall, hashSum) = lookupChecksum(
      graft.expressions.VocabIds.ids(col("syms"), vocab))
    println(f"[encode-probe] VocabIds hash lookup: wall=$hashWall%.2fs " +
      f"checksum=$hashSum")
    if (sys.env.get("ENC_MAPLIT").contains("1")) {
      val cap = sys.env.getOrElse("ENC_MAPLIT_CAP", "4000").toInt
      // capped rung: the scan cost slope, measurable in bounded time
      if (cap > 0 && cap < vocab.size) {
        val vc = vocab.take(cap)
        val mc = typedLit(vc.map { case (i, s) => (s, i) }.toMap)
        val (wH, sH) = lookupChecksum(
          graft.expressions.VocabIds.ids(col("syms"), vc))
        val (wM, sM) = lookupChecksum(transform(col("syms"),
          s => coalesce(element_at(mc, s), lit(-1))))
        require(sH == sM, s"capped lookup checksums diverged: $sH vs $sM")
        println(f"[encode-probe] capped@$cap: hash=$wH%.2fs " +
          f"maplit=$wM%.2fs ratio=${wM / wH}%.0fx (checksums agree)")
      }
      val vmap = typedLit(vocab.map { case (i, s) => (s, i) }.toMap)
      val (mapWall, mapSum) = lookupChecksum(transform(col("syms"),
        s => coalesce(element_at(vmap, s), lit(-1))))
      require(mapSum == hashSum,
        s"full lookup checksums diverged: maplit=$mapSum hash=$hashSum")
      println(f"[encode-probe] maplit lookup (retired path): " +
        f"wall=$mapWall%.2fs ratio=${mapWall / hashWall}%.0fx " +
        "(checksums agree)")
    }

    // --- the full last mile: encode (materialized) -> packed bins
    val encPath = s"target/encode_probe_enc_$nMerges"
    val t2 = System.nanoTime()
    Bpe.encodeIds(docs, "doc_id", "text", merges, vocab)
      .write.mode("overwrite").parquet(encPath)
    val encWall = (System.nanoTime() - t2) / 1e9
    val enc = spark.read.parquet(encPath)
    val encStats = enc.agg(count(lit(1)), sum(col("n_ids")),
      sum(aggregate(col("ids"), lit(0L), (a, x) => a + x.cast("long") + 7L)))
      .collect()(0)
    println(f"[encode-probe] encodeIds (write-materialized): " +
      f"${encStats.getLong(0)} docs, ${encStats.getLong(1)} ids, " +
      f"checksum=${encStats.getLong(2)}, wall=$encWall%.1fs")

    val budget = sys.env.getOrElse("ENC_BUDGET", "2048").toInt
    val t3 = System.nanoTime()
    val bins = Packing.binIdSequences(enc, "doc_id", budget, nShards = 32)
    val binStats = bins.agg(count(lit(1)), sum(col("n_ids")),
      max(col("n_ids"))).collect()(0)
    val binWall = (System.nanoTime() - t3) / 1e9
    println(f"[encode-probe] binIdSequences(budget=$budget): " +
      f"${binStats.getLong(0)} bins, ${binStats.getLong(1)} ids " +
      f"(max/bin ${binStats.getLong(2)}), wall=$binWall%.1fs")
    require(binStats.getLong(1) == encStats.getLong(1),
      "packed id mass != encoded id mass")
    println("[encode-probe] done")
    spark.stop()
  }
}
