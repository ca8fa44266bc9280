package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Structured Streaming behavior with the memory source/sink: windowed
  * aggregation under a watermark, and explicit-state sessionization.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked windowed aggregation emits closed windows only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")

    val q = EventStreams.windowedCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("winout")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:01:00"), "click", 1.0),
        (2L, ts("2024-01-01 00:02:00"), "click", 2.0),
        (3L, ts("2024-01-01 00:07:00"), "view", 3.0))
      q.processAllAvailable()
      // watermark still at max(ts)-10m < first window end ⇒ nothing final
      assert(spark.table("winout").count() == 0)

      // an event far ahead advances the watermark past both windows
      input.addData((4L, ts("2024-01-01 01:00:00"), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("winout")
        .select($"window_start", $"event_type", $"n").as[(Timestamp, String, Long)]
        .collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 00:00:00"), "click", 2L),
        (ts("2024-01-01 00:05:00"), "view", 1L)))
    } finally q.stop()
  }

  test("LakeIngest: streaming to partitioned lake; batch replay replaces, never duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // deleted at the end of the test — repeated sbt runs must not
    // accumulate lake/checkpoint dirs in the temp dir
    val lake = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
    def cleanup(): Unit = Seq(lake, ckpt).foreach(d =>
      scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
    try {
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")

    val q = LakeIngest.start(events, lake, ckpt)
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
        (2L, ts("2024-01-02 11:00:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData((3L, ts("2024-01-02 12:00:00"), "click", 3.0))
      q.processAllAvailable()
      val out = LakeIngest.read(spark, lake)
      assert(out.count() == 3)
      // dt is the first partition level: day filters prune directories
      assert(out.where(col("dt") === "2024-01-02").count() == 2)
    } finally q.stop()

    // simulate the retry of an already-written batch id with the same
    // content: dynamic overwrite must REPLACE its partitions, not append
    val replay = Seq((3L, ts("2024-01-02 12:00:00"), "click", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
    LakeIngest.writeBatch(replay, lake, batchId = 1L)
    assert(LakeIngest.read(spark, lake).count() == 3, "replayed batch duplicated rows")
    // and a retried batch with corrected content replaces outright
    val corrected = Seq((3L, ts("2024-01-02 12:00:00"), "click", 9.0))
      .toDF("event_id", "ts", "event_type", "value")
    LakeIngest.writeBatch(corrected, lake, batchId = 1L)
    val vals = LakeIngest.read(spark, lake)
      .where(col("event_id") === 3L).select("value").as[Double].collect().toSeq
    assert(vals == Seq(9.0))

    // compaction folds a day's batch dirs into batch=-1, keeps the
    // two-level layout readable, and leaves sibling days alone
    LakeIngest.compactDay(spark, lake, "2024-01-02", nFiles = 1)
    val day2 = new java.io.File(s"$lake/dt=2024-01-02").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(day2 == Set(s"batch=${LakeIngest.CompactedBatchId}"),
      s"stale batch dirs not folded: $day2")
    val after = LakeIngest.read(spark, lake)
    assert(after.count() == 3, "compaction must not change row counts")
    assert(after.where(col("dt") === "2024-01-01").count() == 1)
    assert(after.where(col("event_id") === 3L).select("value").as[Double].head() == 9.0)
    } finally cleanup()
  }

  test("LakeIngest compaction: idempotent re-runs, torn staging discarded, crash resume") {
    import org.apache.spark.sql.functions.col
    val lake = java.nio.file.Files.createTempDirectory("graft-ingest-crash").toString
    try {
      def day(d: String) = Seq((1L, ts(s"$d 10:00:00"), "click", 1.0),
        (2L, ts(s"$d 11:00:00"), "view", 2.0))
        .toDF("event_id", "ts", "event_type", "value")
      LakeIngest.writeBatch(day("2024-03-01"), lake, 0L)
      LakeIngest.writeBatch(day("2024-03-01").withColumn("event_id", col("event_id") + 10), lake, 1L)
      LakeIngest.compactDay(spark, lake, "2024-03-01")
      assert(LakeIngest.read(spark, lake).count() == 4)
      // idempotent: compacting an already-compacted day is a no-op
      LakeIngest.compactDay(spark, lake, "2024-03-01")
      assert(LakeIngest.read(spark, lake).count() == 4)
      // a batch landing after compaction folds in on the next pass
      LakeIngest.writeBatch(day("2024-03-01").withColumn("event_id", col("event_id") + 20), lake, 5L)
      LakeIngest.compactDay(spark, lake, "2024-03-01")
      val dirs = new java.io.File(s"$lake/dt=2024-03-01").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(dirs == Set("batch=-1") && LakeIngest.read(spark, lake).count() == 6)

      // torn staging (no _SUCCESS): discarded, compaction still correct
      val staging = new java.io.File(s"$lake/dt=2024-03-01/batch=-2")
      staging.mkdirs()
      java.nio.file.Files.write(new java.io.File(staging, "junk").toPath, Array[Byte](1))
      LakeIngest.writeBatch(day("2024-03-01").withColumn("event_id", col("event_id") + 30), lake, 6L)
      LakeIngest.compactDay(spark, lake, "2024-03-01")
      assert(!staging.exists() && LakeIngest.read(spark, lake).count() == 8)

      // committed staging + leftover input (crash between commit and
      // cleanup): resume deletes the folded leftover, never double-counts
      val dayDir = new java.io.File(s"$lake/dt=2024-03-01")
      val leftover = new java.io.File(dayDir, "batch=9")
      // "crash state": current batch=-1 content is both the staged result
      // and a not-yet-deleted input listed in the staging's fold manifest
      val compacted = new java.io.File(dayDir, "batch=-1")
      def copyDir(src: java.io.File, dst: java.io.File): Unit = {
        dst.mkdirs()
        src.listFiles().foreach(f => java.nio.file.Files.copy(f.toPath,
          new java.io.File(dst, f.getName).toPath))
      }
      copyDir(compacted, leftover)
      copyDir(compacted, staging) // staged result == full day
      // the staged fold consumed batch=-1 (deleted pre-crash) + batch=9;
      // drop the copied Hadoop .crc sidecar or the checksummed local FS
      // rejects the rewritten manifest
      java.nio.file.Files.write(
        new java.io.File(staging, LakeIngest.FoldedManifest).toPath,
        "batch=-1\nbatch=9".getBytes("UTF-8"))
      new java.io.File(staging, s".${LakeIngest.FoldedManifest}.crc").delete()
      new java.io.File(staging, "_SUCCESS").createNewFile()
      scala.reflect.io.Directory(compacted).deleteRecursively() // -1 was deleted pre-crash
      LakeIngest.compactDay(spark, lake, "2024-03-01")
      assert(LakeIngest.read(spark, lake).count() == 8, "resume must not double-count")
      val finalDirs = dayDir.listFiles().map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(finalDirs == Set("batch=-1"), s"resume must finish the swap: $finalDirs")
    } finally {
      scala.reflect.io.Directory(new java.io.File(lake)).deleteRecursively(): Unit
    }
  }

  test("LakeIngest compaction: manifest-less committed staging is quarantined, not wedged") {
    import org.apache.spark.sql.functions.col
    val lake = java.nio.file.Files.createTempDirectory("graft-ingest-orphan").toString
    try {
      def day(d: String) = Seq((1L, ts(s"$d 10:00:00"), "click", 1.0),
        (2L, ts(s"$d 11:00:00"), "view", 2.0))
        .toDF("event_id", "ts", "event_type", "value")
      LakeIngest.writeBatch(day("2024-03-05"), lake, 0L)
      // a pre-manifest-era commit: staged bytes + _SUCCESS, no _FOLDED
      val dayDir = new java.io.File(s"$lake/dt=2024-03-05")
      val staging = new java.io.File(dayDir, "batch=-2")
      staging.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(staging, "junk").toPath, Array[Byte](1))
      new java.io.File(staging, "_SUCCESS").createNewFile()
      // must NOT throw (the wedge), and must refold the surviving input
      LakeIngest.compactDay(spark, lake, "2024-03-05")
      assert(LakeIngest.read(spark, lake)
        .where(col("dt") === "2024-03-05").count() == 2)
      val names = dayDir.listFiles().map(_.getName).toSet
      assert(names.contains("batch=-1"), s"day must be compacted: $names")
      assert(names.exists(_.startsWith("_orphan_staging_")),
        s"legacy staging must be quarantined, not deleted: $names")
      assert(!names.contains("batch=-2"), s"staging must be gone: $names")
      // idempotent: a second pass neither throws nor disturbs quarantine
      LakeIngest.compactDay(spark, lake, "2024-03-05")
      assert(LakeIngest.read(spark, lake)
        .where(col("dt") === "2024-03-05").count() == 2)
    } finally {
      scala.reflect.io.Directory(new java.io.File(lake)).deleteRecursively(): Unit
    }
  }

  test("LakeIngest compaction respects the checkpoint's committed high-water mark") {
    import org.apache.spark.sql.functions.col
    val lake = java.nio.file.Files.createTempDirectory("graft-ingest-hwm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-hwm-ckpt").toString
    def batchDirs() = new java.io.File(s"$lake/dt=2024-04-01").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    try {
      def batchDf(shift: Int) =
        Seq((1L + shift, ts("2024-04-01 10:00:00"), "click", 1.0))
          .toDF("event_id", "ts", "event_type", "value")
      LakeIngest.writeBatch(batchDf(0), lake, 0L)
      LakeIngest.writeBatch(batchDf(10), lake, 1L)
      // checkpoint commit log says only batch 0 is committed
      val commits = new java.io.File(ckpt, "commits"); commits.mkdirs()
      new java.io.File(commits, "0").createNewFile()
      LakeIngest.compactDay(spark, lake, "2024-04-01", checkpointDir = Some(ckpt))
      // batch 1 is uncommitted: it must survive, unfolded
      assert(batchDirs() == Set("batch=-1", "batch=1"), s"got ${batchDirs()}")
      assert(LakeIngest.read(spark, lake).count() == 2)
      // the engine replays the uncommitted batch after compaction:
      // idempotent overwrite of its OWN still-present dir — no double count
      LakeIngest.writeBatch(batchDf(10), lake, 1L)
      assert(LakeIngest.read(spark, lake).count() == 2,
        "replay after compaction double-counted")
      // once the checkpoint commits it, the next pass folds it
      new java.io.File(commits, "1").createNewFile()
      LakeIngest.compactDay(spark, lake, "2024-04-01", checkpointDir = Some(ckpt))
      assert(batchDirs() == Set("batch=-1") &&
        LakeIngest.read(spark, lake).count() == 2)
      // a checkpoint with no commit log yet folds no live batch at all
      val ckptEmpty = java.nio.file.Files.createTempDirectory("graft-hwm-empty").toString
      try {
        LakeIngest.writeBatch(batchDf(20), lake, 7L)
        LakeIngest.compactDay(spark, lake, "2024-04-01", checkpointDir = Some(ckptEmpty))
        assert(batchDirs() == Set("batch=-1", "batch=7"), s"got ${batchDirs()}")
        assert(LakeIngest.read(spark, lake).count() == 3)
      } finally scala.reflect.io.Directory(
        new java.io.File(ckptEmpty)).deleteRecursively(): Unit
    } finally Seq(lake, ckpt).foreach(d =>
      scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively(): Unit)
  }

  test("dedupWithinWatermark drops repeats inside the delay, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.dedupWithinWatermark(events, Seq("event_id"), "10 minutes")
      .writeStream.format("memory").queryName("dedupout")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:01:00"), "click", 1.0),
        (1L, ts("2024-01-01 00:02:00"), "click", 1.0), // dup within delay
        (2L, ts("2024-01-01 00:03:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 00:04:00"), "click", 1.0)) // still dup
      q.processAllAvailable()
      val ids = spark.table("dedupout").select($"event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L), s"one row per key expected, got $ids")
    } finally q.stop()
  }

  test("stateful sessionization: gap closes a session, state emits it once") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sessout")
      .outputMode("append").start()
    try {
      input.addData(
        EventStreams.Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        EventStreams.Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0),
        // > 30 min gap ⇒ first session closes when this arrives
        EventStreams.Event(3, ts("2024-01-01 01:00:00"), 7, "view", 5.0))
      q.processAllAvailable()
      val sessions = spark.table("sessout")
        .as[EventStreams.SessionOut].collect().sortBy(_.session_start.getTime)
      assert(sessions.length == 1, "only the closed session is emitted")
      assert(sessions.head.n_events == 2 && sessions.head.total_value == 3.0)
      assert(sessions.head.session_start == ts("2024-01-01 00:00:00"))
      assert(sessions.head.session_end == ts("2024-01-01 00:10:00"))
    } finally q.stop()
  }
}
