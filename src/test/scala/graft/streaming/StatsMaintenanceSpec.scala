package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{CorpusStats, Sampling}

/** The replay/crash-safety contract of [[StatsMaintenance]]: the one
  * hazard the round-11 maintenance loop left open was at-least-once
  * re-delivery silently double-counting the additive stats table.
  * Every test here compares the maintained store against a full
  * recompute — the strongest check the additive family admits.
  */
class StatsMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-statsmaint").toString

  private val batch1 = Seq(
    (1L, "unique alpha\nBOILER\nunique beta"),
    (2L, "BOILER\nunique gamma"))
  private val batch2 = Seq(
    (3L, "BOILER\nunique delta"),
    (4L, "unique epsilon\nBOILER"))
  private val batch3 = Seq((5L, "solo content only"))

  private def lineDfOf(rows: Seq[(Long, String)]): Seq[(String, Long)] =
    CorpusStats.lineDf(rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  private def foldLines(rows: Seq[(Long, String)], id: Long,
      path: String): Boolean =
    StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id, path,
      Seq("line_key"), Seq("line_df"),
      b => CorpusStats.lineDf(b, "doc_id", "text"))

  private def stored(path: String): Seq[(String, Long)] =
    StatsMaintenance.readStats(spark, path).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  private def dirs(path: String): Seq[String] =
    new java.io.File(path).listFiles().map(_.getName).sorted.toSeq

  private def writeMarker(dir: String, watermark: Long): Unit = {
    val w = new java.io.FileWriter(s"$dir/${StatsMaintenance.Marker}")
    try w.write(watermark.toString) finally w.close()
  }

  test("folds match the full recompute, and a re-delivered batch id is " +
    "skipped without touching the table (the double-count hazard)") {
    val path = tmpDir()
    assert(StatsMaintenance.readStats(spark, path).isEmpty)
    assert(StatsMaintenance.lastFolded(spark, path).isEmpty)
    assert(foldLines(batch1, 0L, path))
    assert(foldLines(batch2, 1L, path))
    assert(foldLines(batch3, 2L, path))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
    // at-least-once re-delivery: the SAME batch arrives again after a
    // restart — the watermark absorbs it, the table must not move
    assert(!foldLines(batch2, 1L, path), "replayed batch must be skipped")
    assert(!foldLines(batch1, 0L, path))
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3),
      "a replayed fold double-counted the maintained table")
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
  }

  test("crash between fold and publish: the torn version is invisible " +
    "to readers and the batch's re-delivery resumes clean") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    val before = stored(path)
    // simulate the crash: batch 1's merged table fully written to the
    // next version dir but the process died BEFORE the commit marker
    CorpusStats.mergeStats(Seq(
        CorpusStats.lineDf(batch1.toDF("doc_id", "text"), "doc_id", "text"),
        CorpusStats.lineDf(batch2.toDF("doc_id", "text"), "doc_id", "text")),
      Seq("line_key"), Seq("line_df"))
      .write.mode("overwrite").parquet(s"$path/v=1")
    // readers and the watermark must not see the torn version
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L))
    assert(stored(path) == before, "torn staging leaked into a read")
    // the engine re-delivers batch 1 (its offsets were never committed):
    // the fold publishes past the debris and prunes it
    assert(foldLines(batch2, 1L, path), "redelivery after a torn fold must fold")
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(dirs(path) == Seq("v=2"), s"torn/superseded versions not pruned: ${dirs(path)}")
    assert(new java.io.File(
      s"$path/v=2/${StatsMaintenance.Marker}").exists())
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
  }

  test("crash after publish before prune: readers take the newest " +
    "committed version and the next fold prunes the stale one") {
    val path = tmpDir()
    // hand-build the post-crash layout: the superseded version v=0
    // (watermark 0) survived an interrupted prune next to the newly
    // committed v=1 (watermark 3)
    batch3.toDF("doc_id", "text")
      .select(trim(col("text")).as("line_key"), lit(1L).as("line_df"))
      .write.mode("overwrite").parquet(s"$path/v=0")
    writeMarker(s"$path/v=0", 0L)
    CorpusStats.lineDf(batch1.toDF("doc_id", "text"), "doc_id", "text")
      .write.mode("overwrite").parquet(s"$path/v=1")
    writeMarker(s"$path/v=1", 3L)
    assert(StatsMaintenance.lastFolded(spark, path).contains(3L),
      "watermark must come from the NEWEST committed version")
    assert(stored(path) == lineDfOf(batch1), "reader picked a stale version")
    // replay below the recovered watermark still skips
    assert(!foldLines(batch3, 2L, path))
    assert(foldLines(batch2, 4L, path))
    assert(dirs(path) == Seq("v=2"), s"stale committed version survived: ${dirs(path)}")
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(StatsMaintenance.lastFolded(spark, path).contains(4L))
  }

  test("retractBatch deletes a constituent day exactly and does NOT " +
    "advance the watermark (a later real batch must not be skipped)") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    assert(foldLines(batch2, 1L, path))
    // delete batch1's documents: subtract its recomputed partial
    StatsMaintenance.retractBatch(spark, path,
      CorpusStats.lineDf(batch1.toDF("doc_id", "text"), "doc_id", "text"),
      Seq("line_key"), Seq("line_df"))
    assert(stored(path) == lineDfOf(batch2),
      "retraction drifted from the survivors' recompute")
    // watermark preserved: old ids still replay-skip, new ids fold
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
    assert(!foldLines(batch1, 1L, path))
    assert(foldLines(batch3, 2L, path))
    assert(stored(path) == lineDfOf(batch2 ++ batch3))
    // a second identical retraction is NOT idempotent by design — the
    // negative-count guard fails it loudly (non-constituent partial)
    intercept[Exception] {
      StatsMaintenance.retractBatch(spark, path,
        CorpusStats.lineDf(batch1.toDF("doc_id", "text"), "doc_id", "text"),
        Seq("line_key"), Seq("line_df"))
    }
    // the failed publish never committed: table and watermark unchanged
    assert(stored(path) == lineDfOf(batch2 ++ batch3))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
  }

  test("streaming e2e: the maintained store equals the recompute and " +
    "gates a later day; a forged replay cannot corrupt it") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmpDir()
    val ckpt = tmpDir()
    val input = MemoryStream[(Long, String)]
    val q = StatsMaintenance.start(
      input.toDF().toDF("doc_id", "text"), path,
      Seq("line_key"), Seq("line_df"),
      b => CorpusStats.lineDf(b, "doc_id", "text"), ckpt)
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
    } finally q.stop()
    val full = lineDfOf(batch1 ++ batch2 ++ batch3)
    assert(stored(path) == full, "incremental maintenance drifted from recompute")
    assert(stored(path).find(_._1 == "BOILER").map(_._2).contains(4L))
    // replay with DIFFERENT content at an absorbed id (worst-case
    // at-least-once pathology): still skipped, table untouched
    assert(!foldLines(Seq((99L, "BOILER\nBOILER2")), 0L, path))
    assert(stored(path) == full)
    // gate a NEW day against the maintained table without recounting
    val day = Seq((9L, "fresh words today\nBOILER")).toDF("doc_id", "text")
    val gated = CorpusStats.dropDuplicateLinesWith(day, "doc_id", "text",
        StatsMaintenance.readStats(spark, path).get, maxDocFreq = 3)
      .as[(Long, Long, Long, String)].collect().head
    assert(gated == ((9L, 2L, 1L, "fresh words today")))
  }

  test("retain > 1 keeps a concurrent-reader grace window of committed " +
    "versions; readers still take the newest") {
    val path = tmpDir()
    def fold(rows: Seq[(Long, String)], id: Long): Boolean =
      StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id, path,
        Seq("line_key"), Seq("line_df"),
        b => CorpusStats.lineDf(b, "doc_id", "text"), retain = 2)
    assert(fold(batch1, 0L))
    // a reader opens the current version NOW...
    val openReader = StatsMaintenance.readStats(spark, path).get
    assert(fold(batch2, 1L))
    // ...and stays valid across the next publish (retain=2 grace)
    assert(dirs(path) == Seq("v=0", "v=1"), s"grace window lost: ${dirs(path)}")
    assert(openReader.as[(String, Long)].collect().sortBy(_._1).toSeq ==
      lineDfOf(batch1), "in-flight reader broken by the prune")
    // new readers take the newest committed version
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    // the window slides: a third fold drops v=0
    assert(fold(batch3, 2L))
    assert(dirs(path) == Seq("v=1", "v=2"), s"window did not slide: ${dirs(path)}")
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
  }

  test("REAL engine redelivery: crash after the fold committed but " +
    "before the engine's commit log — Spark re-runs the batch on " +
    "restart and the watermark absorbs it") {
    val path = tmpDir()
    val ckpt = tmpDir()
    val src = tmpDir()
    val schema = batch1.toDF("doc_id", "text").schema
    def addFile(rows: Seq[(Long, String)], name: String): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$src/$name")
    def startQ() = StatsMaintenance.start(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*"),
      path, Seq("line_key"), Seq("line_df"),
      b => CorpusStats.lineDf(b, "doc_id", "text"), ckpt)
    addFile(batch1, "d1")
    val q1 = startQ()
    try {
      q1.processAllAvailable()
      addFile(batch2, "d2")
      q1.processAllAvailable()
    } finally q1.stop()
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
    // the crash window: the fold's publish committed (above), but the
    // engine died before writing its own commit log for batch 1 — on
    // restart Structured Streaming REDELIVERS batch 1 for real
    val lastCommit = new java.io.File(s"$ckpt/commits/1")
    assert(lastCommit.exists, "test setup: expected commit log entry 1")
    assert(lastCommit.delete())
    // the local ChecksumFileSystem keeps a hidden .crc sibling; left
    // behind it makes the re-run's commit write look like a concurrent
    // writer (HDFSMetadataLog's already-exists detection)
    new java.io.File(s"$ckpt/commits/.1.crc").delete(): Unit
    val q2 = startQ()
    try {
      q2.processAllAvailable() // engine re-runs batch 1 -> must skip
      assert(stored(path) == lineDfOf(batch1 ++ batch2),
        "engine-redelivered batch was double-counted")
      addFile(batch3, "d3") // and genuinely new data still folds
      q2.processAllAvailable()
    } finally q2.stop()
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
  }

  test("the other maintained shapes fold through the same store: " +
    "token-df (one count) and the DSIR model (two counts)") {
    val path1 = tmpDir()
    def foldToks(rows: Seq[(Long, String)], id: Long): Boolean =
      StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id, path1,
        Seq("token"), Seq("token_df"),
        b => CorpusStats.tokenDf(b, "doc_id", "text"))
    assert(foldToks(batch1, 0L) && foldToks(batch2, 1L))
    assert(!foldToks(batch2, 1L))
    val tokGot = StatsMaintenance.readStats(spark, path1).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val tokFull = CorpusStats.tokenDf(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(tokGot == tokFull)

    val path2 = tmpDir()
    def foldDsir(rows: Seq[(Long, String)], id: Long): Boolean =
      StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id, path2,
        Seq("bucket"), Seq("tgt_n", "raw_n"),
        b => Sampling.dsirModel(b, "doc_id", "text",
          col("doc_id") % 2 === 0, buckets = 64))
    assert(foldDsir(batch1, 0L) && foldDsir(batch2, 1L) && foldDsir(batch3, 2L))
    val dsirGot = StatsMaintenance.readStats(spark, path2).get
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val dsirFull = Sampling.dsirModel(
        (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"), "doc_id",
        "text", col("doc_id") % 2 === 0, buckets = 64)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dsirGot == dsirFull)
  }
}
