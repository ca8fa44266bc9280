package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Sampling}

/** Scale-decade probe for the round-10 curation additions on the
  * realistic Zipf/Heaps corpora (same corpora as the round-9
  * re-anchor): times [[CorpusStats.dropDuplicateLines]],
  * [[Sampling.tokenBudgetSelect]] and [[Sampling.dsirWeights]] at the
  * 500k-doc (sf10z) and 5M-doc (sf100z) points and checks the
  * invariants that prove the runs did real work (planted boilerplate
  * actually stripped; budget prefix tight; DSIR masses positive).
  *
  * Budget-select runs twice per corpus: spread strata (distinct-ratio
  * per-mille quality) and the single-stratum WORST case (constant
  * quality — the whole corpus lands in one stratum and the hash-bucket
  * level must absorb it; this is the shape that would melt a naive
  * global-window implementation).
  *
  * {{{
  * SPARK_GRAFT_CPUS=16 sbt 'runMain graft.tools.CurationScaleProbe'
  * }}}
  */
object CurationScaleProbe {
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

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curation-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    for (dir <- Seq("target/testdata/sf10z", "target/testdata/sf100z")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      println(s"[curation-probe] == $dir: $n docs")

      // --- line dedup over the 8-token lined rendition + planted boilerplate
      val lines0 = transform(
        graft.functions.TextFunctions.tokenChunks(col("text"), 8, 8),
        c => array_join(c.getField("toks"), " "))
      val t2 = concat(
        when(col("doc_id") % 3 === 0,
          lit("subscribe to our newsletter\n")).otherwise(lit("")),
        array_join(lines0, "\n"),
        when(col("doc_id") % 5 === 0,
          lit("\nall rights reserved")).otherwise(lit("")))
      val lined = docs.withColumn("__t2", t2)
      val ld = timed(s"dropDuplicateLines n=$n") {
        val out = CorpusStats.dropDuplicateLines(lined, "doc_id", "__t2", 10)
        out.agg(sum("n_lines"), sum("n_kept"),
          sum(when(col("clean_text").contains("subscribe to our newsletter") ||
            col("clean_text").contains("all rights reserved"), 1L)
            .otherwise(0L))).as[(Long, Long, Long)].head()
      }
      println(s"[curation-probe]   lines=${ld._1} kept=${ld._2} boilerplate_survivors=${ld._3}")
      require(ld._3 == 0L, "planted boilerplate must be stripped")
      require(ld._2 < ld._1, "something must have been dropped")

      // --- token-budget select, spread strata (distinct-ratio quality)
      val base = docs
        .withColumn("__st",
          graft.expressions.TokenStats.stats(col("text"), Nil))
        .withColumn("__q",
          when(col("__st.n_tokens") === 0, lit(0L)).otherwise(
            floor(col("__st.n_distinct").cast("double") * 1000.0 /
              col("__st.n_tokens").cast("double")).cast("long")))
      val budget = n * 40L // ~half the corpus tokens (~80 tok/doc)
      val sel = timed(s"tokenBudgetSelect spread n=$n") {
        Sampling.tokenBudgetSelect(base, "doc_id", col("__q"),
            col("__st.n_tokens").cast("long"), budget, 1024)
          .agg(count(lit(1)), max("cum_tokens"), min("quality"))
          .as[(Long, Long, Long)].head()
      }
      println(s"[curation-probe]   selected=${sel._1} max_cum=${sel._2} min_q=${sel._3}")
      require(sel._2 <= budget && sel._1 > 0 && sel._1 < n,
        "budget prefix must be tight and proper")

      // --- token-budget select, single-stratum worst case
      val sel1 = timed(s"tokenBudgetSelect one-stratum n=$n") {
        Sampling.tokenBudgetSelect(base, "doc_id", lit(0L),
            col("__st.n_tokens").cast("long"), budget, 1024)
          .agg(count(lit(1)), max("cum_tokens"))
          .as[(Long, Long)].head()
      }
      println(s"[curation-probe]   selected=${sel1._1} max_cum=${sel1._2}")
      require(sel1._2 <= budget && sel1._1 > 0 && sel1._1 < n)

      // --- DSIR weights: target = the ~10% of docs hashed into bucket 0..99
      val dsir = timed(s"dsirWeights n=$n") {
        Sampling.dsirWeights(docs, "doc_id", "text",
            Sampling.hashBucket(col("doc_id").cast("string"), 1000) < 100,
            buckets = 4096)
          .agg(count(lit(1)), sum("tgt_mass"), sum("raw_mass"),
            sum(when(col("dsir_weight").isNull, 1L).otherwise(0L)))
          .as[(Long, Long, Long, Long)].head()
      }
      println(s"[curation-probe]   rows=${dsir._1} tgt_mass=${dsir._2} raw_mass=${dsir._3} null_weights=${dsir._4}")
      require(dsir._1 == n && dsir._2 > 0 && dsir._3 > 0)
    }
    spark.stop()
  }
}
