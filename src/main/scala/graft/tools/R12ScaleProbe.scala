package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.{Bpe, CorpusStats}
import graft.streaming.StatsMaintenance

/** Round-12 additions at the 500k-doc decade (zipf sf10z):
  *
  *  1. the replay-safe stats STORE operated like production — the
  *     corpus folded as five disjoint "days" through
  *     [[StatsMaintenance.foldBatch]] (parquet-backed versioned
  *     publishes), per-fold wall, final table ≡ one full recompute,
  *     replay of a folded day a no-op, then [[StatsMaintenance
  *     .retractBatch]] of day 0 ≡ the survivors' recompute;
  *  2. trained language-ID ([[CorpusStats.langClassify]]) over all
  *     500k docs: wall + agreement with the declared label;
  *  3. tokenizer last mile ([[Bpe.encodeIds]]) under a 200-merge
  *     batched-trained vocab over all 500k docs: wall + id mass.
  *
  * {{{
  * SPARK_DRIVER_MEM=24g sbt 'runMain graft.tools.R12ScaleProbe'
  * }}}
  */
object R12ScaleProbe {
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

    val dir = sys.env.getOrElse("CORPUS_DIR", "target/testdata/sf10z")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    println(s"[r12-probe] corpus=$dir docs=$nDocs")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r12-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val cols = df.columns.map(col).toSeq
      val r = df.agg(count(lit(1)),
        sum(conv(md5(concat_ws("|", cols: _*)).substr(1, 8), 16, 10)
          .cast("long"))).head()
      (r.getLong(0), r.getLong(1))
    }

    // ---- 1. the maintained store, operated as five days ------------------
    val store = java.nio.file.Files
      .createTempDirectory("r12-store").toString
    val nBatches = 5
    (0 until nBatches).foreach { d =>
      val day = docs.where(pmod(col("doc_id"), lit(nBatches)) === d)
      val folded = timed(s"fold day $d (store publish incl.)") {
        StatsMaintenance.foldBatch(day, d.toLong, store,
          Seq("line_key"), Seq("line_df"),
          b => CorpusStats.lineDf(b, "doc_id", "text"))
      }
      assert(folded, s"day $d unexpectedly skipped")
    }
    val replayed = StatsMaintenance.foldBatch(
      docs.where(pmod(col("doc_id"), lit(nBatches)) === 2), 2L, store,
      Seq("line_key"), Seq("line_df"),
      b => CorpusStats.lineDf(b, "doc_id", "text"))
    println(s"[r12-probe] replay of folded day skipped: ${!replayed}")
    assert(!replayed)
    val maintained = StatsMaintenance.readStats(spark, store).get
    val (mRows, mSum) = timed("checksum maintained table") {
      checksum(maintained.select(col("line_key"), col("line_df"))) }
    val full = timed("full line-df recompute (the non-incremental bill)") {
      val f = CorpusStats.lineDf(docs, "doc_id", "text")
      checksum(f.select(col("line_key"), col("line_df")))
    }
    println(s"[r12-probe] maintained=($mRows, $mSum) recompute=$full " +
      s"equal=${(mRows, mSum) == full}")
    assert((mRows, mSum) == full, "maintained store drifted from recompute")
    val storeBytes = {
      def size(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      size(new java.io.File(store))
    }
    println(f"[r12-probe] store on disk: ${storeBytes / 1e6}%.1f MB " +
      s"(Heaps-law line vocabulary, not corpus-sized)")
    timed("retract day 0 (publish incl.)") {
      StatsMaintenance.retractBatch(spark, store,
        CorpusStats.lineDf(
          docs.where(pmod(col("doc_id"), lit(nBatches)) === 0),
          "doc_id", "text"),
        Seq("line_key"), Seq("line_df"))
    }
    val afterRetract = checksum(StatsMaintenance.readStats(spark, store).get
      .select(col("line_key"), col("line_df")))
    val survivors = timed("survivors' recompute (days 1-4)") {
      checksum(CorpusStats.lineDf(
        docs.where(pmod(col("doc_id"), lit(nBatches)) =!= 0),
        "doc_id", "text").select(col("line_key"), col("line_df")))
    }
    println(s"[r12-probe] retracted=$afterRetract survivors=$survivors " +
      s"equal=${afterRetract == survivors}")
    assert(afterRetract == survivors, "retraction drifted from recompute")
    assert(StatsMaintenance.lastFolded(spark, store).contains(4L),
      "retraction must not move the watermark")

    // ---- 2. trained language-ID over the full corpus ---------------------
    val cls = timed("langClassify (train profiles + classify 500k docs)") {
      val c = CorpusStats.langClassify(docs, "doc_id", "lang", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val agree = cls.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .agg(count(lit(1)),
        sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L)))
      .head()
    println(f"[r12-probe] langid agreement with declared: " +
      f"${agree.getLong(1)}/${agree.getLong(0)} " +
      f"(${100.0 * agree.getLong(1) / agree.getLong(0)}%.2f%%)")
    cls.unpersist(blocking = false)

    // ---- 3. encodeIds under a 200-merge vocab ----------------------------
    val merges = timed("trainMergesBatched(200)") {
      Bpe.trainMergesBatched(docs, "text", 200)
    }
    val voc = timed("vocab assembly") { Bpe.vocab(docs, "text", merges) }
    println(s"[r12-probe] merges=${merges.size} vocab=${voc.size}")
    val enc = timed("encodeIds over 500k docs (count + id mass)") {
      Bpe.encodeIds(docs, "doc_id", "text", merges, voc)
        .agg(count(lit(1)), sum(col("n_ids")),
          sum(when(element_at(col("ids"), 1) === -1, 1L).otherwise(0L)))
        .head()
    }
    println(s"[r12-probe] docs=${enc.getLong(0)} total_ids=${enc.getLong(1)}")
    assert(enc.getLong(0) == nDocs)

    spark.stop()
  }
}
