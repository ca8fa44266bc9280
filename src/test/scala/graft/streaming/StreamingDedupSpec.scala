package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpusDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (11L, "completely different corpus text talking about databases and query engines"),
    (12L, "a third corpus document with its own unmistakably distinct wording here"))

  test("rowBandArray keys equal the batch signing path's band keys") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val sets = docs.select(col("doc_id"),
      Dedup.hashedShingleSet(col("text"), 5).as("__set"))
    val perRow = sets.select(col("doc_id"),
        explode(Dedup.rowBandArray(col("__set"), 8, 2)).as("band"))
      .as[(Long, String)].collect().toSet
    val batch = StreamingDedup.corpusIndex(docs, "doc_id", "text", 5, 8, 2)
      .select(col("corpus_id"), col("band"))
      .as[(Long, String)].collect().toSet
    assert(perRow == batch, "streaming and batch band keys drifted")
  }

  test("nearDupFlags: verbatim + near-dup flagged once, fresh doc clean") {
    val index = StreamingDedup.corpusIndex(
      corpusDocs.toDF("doc_id", "text"), "doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val flags = StreamingDedup.nearDupFlags(
      input.toDF().toDF("doc_id", "text"), index, "doc_id", "text")
    val q = flags.writeStream.format("memory").queryName("nd_flags").start()
    try {
      input.addData(
        // verbatim copy of corpus doc 10: matches on EVERY band — the
        // min-shared-band predicate must still emit exactly one row
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        // near-dup of corpus doc 10 (one word changed)
        (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (3L, "entirely fresh content that matches nothing in the corpus at all now"))
      q.processAllAvailable()
      val out = spark.table("nd_flags")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(out.count(r => r._1 == 1L) == 1, s"verbatim must flag exactly once: ${out.toSeq}")
      assert(out.find(_._1 == 1L).get._2 == 10L)
      assert(out.find(_._1 == 1L).get._3 == 1.0)
      val near = out.filter(_._1 == 2L)
      assert(near.length == 1 && near.head._2 == 10L && near.head._3 >= 0.7,
        s"near-dup must flag against doc 10: ${out.toSeq}")
      assert(!out.exists(_._1 == 3L), s"fresh doc must not flag: ${out.toSeq}")
      // second batch: stateless — same doc content flags again
      input.addData((4L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      q.processAllAvailable()
      assert(spark.table("nd_flags").where($"doc_id" === 4L).count() == 1)
    } finally q.stop()
  }

  test("quality gates stream: c4Clean + LineStats/TokenStats are map-only " +
      "stateless transforms over a readStream") {
    // the ingest-time quality filter every streaming curation front
    // door needs: both the kernels and the HOF rules are per-row, so
    // they compose into a streaming query with no state store at all
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    import graft.functions.{TextFunctions => T}
    val scored = input.toDF().toDF("doc_id", "text")
      .withColumn("__c", T.c4Clean($"text"))
      .withColumn("__l", T.lineStats($"text"))
      .select($"doc_id", $"__c.n_kept".as("n_kept"),
        $"__c.dropped".as("dropped"), $"__l.n_dup_lines".as("dups"))
    val q = scored.writeStream.format("memory").queryName("q_gate").start()
    try {
      val goodDoc = (1 to 3).map(i =>
        s"line number $i with plenty words here.").mkString("\n")
      input.addData(
        (1L, goodDoc),                       // 3 kept lines -> survives
        (2L, "too short.\nonly two lines."), // <3 kept -> dropped
        (3L, "dup line\ndup line\ndup line")) // dups counted, dropped (no punct)
      q.processAllAvailable()
      val out = spark.table("q_gate")
        .as[(Long, Int, Boolean, Int)].collect().sortBy(_._1)
      assert(out.toSeq == Seq((1L, 3, false, 0), (2L, 0, true, 0),
        (3L, 0, true, 3)), s"got ${out.toSeq}")
    } finally q.stop()
  }

  test("bucketed index: pruned gate ≡ full gate, and the scan actually prunes") {
    // a corpus big enough that its bands spread over many buckets
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bidx").toString
    try {
      StreamingDedup.writeBucketedIndex(
        StreamingDedup.corpusIndex(corpus, "doc_id", "text"), dir, nBuckets = 32)
      // batch: one verbatim corpus doc + one fresh doc
      val sample = corpus.orderBy("doc_id").limit(1)
        .as[(Long, String)].head()
      val batch = Seq((901L, sample._2),
        (902L, "wholly novel text that shares nothing with the corpus whatsoever"))
        .toDF("doc_id", "text")
      val pruned = StreamingDedup.nearDupFlagsPruned(
        batch, dir, "doc_id", "text")
      val full = StreamingDedup.nearDupFlags(
        batch, StreamingDedup.corpusIndex(corpus, "doc_id", "text"),
        "doc_id", "text")
      val got = pruned.as[(Long, Long, Double)].collect().toSet
      val want = full.as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"pruned gate diverged: $got vs $want")
      assert(got.exists(_._1 == 901L), "verbatim doc must flag")
      // the index scan must carry a partition filter on __bb — that is
      // what turns index size into O(buckets_hit / nBuckets). AQE wraps
      // the executed plan, so unwrap adaptively before collecting.
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scansOf(a.executedPlan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        }.flatten
      val scans = scansOf(pruned.queryExecution.executedPlan)
        .filter(_.partitionFilters.exists(_.toString.contains("__bb")))
      assert(scans.nonEmpty, "index scan lost its __bb partition filter")
      // a 2-doc batch has ≤ 8 band keys → ≤ 8 of 32 buckets survive
      val kept = scans.head.relation.location.listFiles(
        scans.head.partitionFilters, Nil).length
      assert(kept <= 8 && kept >= 1, s"expected ≤8 of 32 partitions, got $kept")
    } finally {
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively(): Unit
    }
  }

  test("foreachBatch pruned gate e2e: streamed flags equal the full gate") {
    // the intended deployment shape: a streaming query hands each
    // micro-batch to nearDupFlagsPruned inside foreachBatch (where a
    // bounded driver action is legal), against a lake-materialized
    // bucketed index
    val corpus = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bidx-e2e").toString
    try {
      StreamingDedup.writeBucketedIndex(
        StreamingDedup.corpusIndex(corpus, "doc_id", "text"), dir, nBuckets = 32)
      val samples = corpus.orderBy("doc_id").limit(2)
        .as[(Long, String)].collect()
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
        (batch, _) => {
          val rows = StreamingDedup
            .nearDupFlagsPruned(batch, dir, "doc_id", "text")
            .as[(Long, Long, Double)].collect()
          got.synchronized { got ++= rows }: Unit
        }
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream.foreachBatch(fn).start()
      try {
        input.addData(
          (901L, samples(0)._2),
          (902L, "wholly novel text that shares nothing with the corpus whatsoever"))
        q.processAllAvailable()
        input.addData(
          (903L, samples(1)._2),
          (904L, samples(0)._2 + " extra"))
        q.processAllAvailable()
      } finally q.stop()
      val allDocs = Seq(
        (901L, samples(0)._2),
        (902L, "wholly novel text that shares nothing with the corpus whatsoever"),
        (903L, samples(1)._2),
        (904L, samples(0)._2 + " extra")).toDF("doc_id", "text")
      val want = StreamingDedup.nearDupFlags(allDocs,
          StreamingDedup.corpusIndex(corpus, "doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Double)].collect().toSet
      assert(got.toSet == want, s"streamed pruned flags diverged: " +
        s"${got.toSet} vs $want")
      assert(got.exists(_._1 == 901L) && got.exists(_._1 == 903L),
        "verbatim docs must flag across separate micro-batches")
      assert(!got.exists(_._1 == 902L), "fresh doc must not flag")
    } finally {
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively(): Unit
    }
  }

  test("incremental line-df maintenance: per-micro-batch partials folded " +
    "into a stats table equal the full recompute; the maintained table " +
    "gates a later batch") {
    import graft.operators.CorpusStats
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      (1L, "unique alpha\nBOILER\nunique beta"),
      (2L, "BOILER\nunique gamma"))
    val batch2 = Seq(
      (3L, "BOILER\nunique delta"),
      (4L, "unique epsilon\nBOILER"))
    val batch3 = Seq((5L, "solo content only"))
    val input = MemoryStream[(Long, String)]
    // the maintenance MERGE MATH: fold each micro-batch's partial into
    // the running stats table (materialized per batch to cut lineage).
    // NOTE this bare fold ignores batchId and is NOT replay-safe under
    // at-least-once delivery — the production loop is StatsMaintenance
    // (watermark + atomic publish, its own spec); this test pins only
    // that folded partials equal the recompute
    var stats = Seq.empty[(String, Long)].toDF("line_key", "line_df")
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        stats = CorpusStats.mergeLineDf(Seq(stats,
          CorpusStats.lineDf(b, "doc_id", "text"))).localCheckpoint(true)
      }.start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
    } finally q.stop()
    val maintained = stats.as[(String, Long)].collect().sortBy(_._1).toSeq
    val full = CorpusStats.lineDf(
        (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(maintained == full, "incremental maintenance drifted from recompute")
    assert(maintained.find(_._1 == "BOILER").map(_._2).contains(4L))
    // gate a NEW day against the maintained table without recounting
    val day = Seq((9L, "fresh words today\nBOILER")).toDF("doc_id", "text")
    val gated = CorpusStats.dropDuplicateLinesWith(day, "doc_id", "text",
        stats, maxDocFreq = 3)
      .as[(Long, Long, Long, String)].collect().head
    assert(gated == ((9L, 2L, 1L, "fresh words today")))
  }

  test("band-parameter footguns fail loudly, never silently zero-match") {
    val corpus = corpusDocs.toDF("doc_id", "text")
    // k not a multiple of rowsPerBand would silently drop trailing sigs
    intercept[IllegalArgumentException] {
      StreamingDedup.corpusIndex(corpus, "doc_id", "text", 5, 8, 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.rowBandArray(col("text"), 8, 3)
    }
    // probing an index built with a different band width would join on
    // disjoint keys and flag nothing — construction must refuse
    val index2 = StreamingDedup.corpusIndex(corpus, "doc_id", "text", 5, 8, 2)
    intercept[IllegalArgumentException] {
      StreamingDedup.nearDupFlags(corpus, index2, "doc_id", "text", 5, 8, 4)
    }
  }

  test("notInCorpus drops byte-identical docs, passes everything else") {
    val corpus = corpusDocs.toDF("doc_id", "text")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val gated = StreamingDedup.notInCorpus(
      input.toDF().toDF("doc_id", "text"), corpus, "text")
    val q = gated.writeStream.format("memory").queryName("nd_gate").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (3L, "entirely fresh content that matches nothing in the corpus at all now"))
      q.processAllAvailable()
      val kept = spark.table("nd_gate").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(2L, 3L), s"only the byte-identical doc drops: ${kept.toSeq}")
    } finally q.stop()
  }
}
