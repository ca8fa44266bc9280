package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** The incremental-maintenance value proposition, measured: admitting
  * one new "day" of documents against a MAINTAINED corpus-stats table
  * versus recounting the whole corpus — the reference's
  * hash-gate/watermark ethos (never recount history) applied to
  * line-df and token-df at the scale decade.
  *
  * Corpus = sf100z (5M docs) as maintained history; day = sf10z
  * (500k docs, 10% of history). Measures:
  *  1. full recompute over history+day (what a non-incremental
  *     pipeline pays every day);
  *  2. day-partial + additive merge with the maintained table (what
  *     the incremental pipeline pays);
  *  3. equality of the two (the merge contract, at the decade);
  *  4. gating the day's docs against the merged table
  *     (dropDuplicateLinesWith — the day's admission bill).
  *
  * {{{
  * SPARK_DRIVER_MEM=24g sbt 'runMain graft.tools.IncrementalStatsProbe'
  * }}}
  */
object IncrementalStatsProbe {
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

    val histDir = sys.env.getOrElse("HIST_DIR", "target/testdata/sf100z")
    val dayDir = sys.env.getOrElse("DAY_DIR", "target/testdata/sf10z")
    // day ids shifted so the two corpora are disjoint doc spaces
    val hist = spark.read.parquet(s"$histDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val day = spark.read.parquet(s"$dayDir/documents.parquet")
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    println(s"[incr-probe] history=${hist.count()} day=${day.count()}")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[incr-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def checksum(df: org.apache.spark.sql.DataFrame, k: String, v: String)
        : (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(conv(md5(concat_ws("|", col(k), col(v))).substr(1, 8), 16, 10)
          .cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }

    // token-df --------------------------------------------------------
    // the maintained table: one-time history count (persist = the
    // "stored stats table" a real deployment reads from parquet)
    val maintainedTok = timed("token-df: build maintained history table") {
      val t = CorpusStats.tokenDf(hist, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val fullTok = timed("token-df: FULL recompute history+day") {
      checksum(CorpusStats.tokenDf(hist.unionByName(day), "doc_id", "text"),
        "token", "token_df")
    }
    val incrTok = timed("token-df: day partial + merge (incremental)") {
      checksum(CorpusStats.mergeTokenDf(Seq(maintainedTok,
        CorpusStats.tokenDf(day, "doc_id", "text"))), "token", "token_df")
    }
    require(fullTok == incrTok,
      s"token-df merge != recompute at the decade: $fullTok vs $incrTok")
    println(s"[incr-probe] token-df vocab=${fullTok._1} IDENTICAL")

    // line-df (8-token lined rendition, same as the oracle queries) ---
    def lined(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      array_join(transform(
        graft.functions.TextFunctions.tokenChunks(col("text"), 8, 8),
        c => array_join(c.getField("toks"), " ")), "\n").as("text"))
    val histL = lined(hist)
    val dayL = lined(day)
    val maintainedLine = timed("line-df: build maintained history table") {
      val t = CorpusStats.lineDf(histL, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t.count(); t
    }
    val fullLine = timed("line-df: FULL recompute history+day") {
      checksum(CorpusStats.lineDf(histL.unionByName(dayL), "doc_id", "text"),
        "line_key", "line_df")
    }
    val incrLine = timed("line-df: day partial + merge (incremental)") {
      checksum(CorpusStats.mergeLineDf(Seq(maintainedLine,
        CorpusStats.lineDf(dayL, "doc_id", "text"))), "line_key", "line_df")
    }
    require(fullLine == incrLine,
      s"line-df merge != recompute at the decade: $fullLine vs $incrLine")
    println(s"[incr-probe] line-df keys=${fullLine._1} IDENTICAL")

    // the day's admission bill: gate the day through the merged table
    timed("line-df: gate the day's docs against the maintained table") {
      val merged = CorpusStats.mergeLineDf(Seq(maintainedLine,
        CorpusStats.lineDf(dayL, "doc_id", "text")))
      val g = CorpusStats.dropDuplicateLinesWith(dayL, "doc_id", "text",
          merged, maxDocFreq = 10)
        .agg(sum("n_lines"), sum("n_kept")).as[(Long, Long)].head()
      println(s"[incr-probe]   day lines=${g._1} kept=${g._2}")
    }

    // scoring-only decade legs: the maintained-model *With paths over
    // the FULL history — what a daily re-score costs when the model is
    // already maintained (the self-trained forms pay training too)
    val histLang = spark.read.parquet(s"$histDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val lmModel = timed("bigram-LM: build + persist maintained model (en slice)") {
      val m = graft.operators.CorpusStats.bigramCounts(
          histLang.where(col("lang") === "en"), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[incr-probe]   model rows=${m.count()}")
      m
    }
    timed("bigram-LM: SCORE the full history against the maintained model") {
      val s2 = graft.operators.CorpusStats
        .bigramLmWith(histLang, "doc_id", "text", lmModel)
        .agg(count(lit(1)), sum("n_bigrams")).as[(Long, Long)].head()
      println(s"[incr-probe]   scored=${s2._1} bigrams=${s2._2}")
    }
    val dsModel = timed("DSIR: build + persist maintained model (en target)") {
      val m = graft.operators.Sampling.dsirModel(histLang, "doc_id", "text",
          col("lang") === "en", buckets = 4096)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[incr-probe]   model rows=${m.count()}")
      m
    }
    timed("DSIR: WEIGHT the full history against the maintained model") {
      val s3 = graft.operators.Sampling
        .dsirWeightsWith(histLang, "doc_id", "text", dsModel, buckets = 4096)
        .agg(count(lit(1)), sum("n_feats")).as[(Long, Long)].head()
      println(s"[incr-probe]   weighted=${s3._1} feats=${s3._2}")
    }
    println("[incr-probe] OK")
    spark.stop()
  }
}
