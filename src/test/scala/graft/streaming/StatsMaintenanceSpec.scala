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
      path: String, retain: Int = 1): Boolean =
    StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id, path,
      Seq("line_key"), Seq("line_df"),
      b => CorpusStats.lineDf(b, "doc_id", "text"), retain)

  private def linePartial(rows: Seq[(Long, String)]): DataFrame =
    CorpusStats.lineDf(rows.toDF("doc_id", "text"), "doc_id", "text")

  /** Manufacture the BOTH-COMMITTED post-commit conflict
    * deterministically: writer A pauses with its marker created but
    * EMPTY (torn), writer B publishes through its own commit point and
    * pauses BEFORE its post-commit check (so its prune never deletes
    * A's torn dir), A's marker content lands (A committed), then B's
    * check runs. Returns what each writer threw.
    */
  private def bothCommitDrill(path: String, aRows: Seq[(Long, String)],
      aId: Long, bRows: Seq[(Long, String)], bId: Long)
      : (Throwable, Throwable) = {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val aAtMarker = new CountDownLatch(1)
    val bCommitted = new CountDownLatch(1)
    val bGo = new CountDownLatch(1)
    @volatile var aErr: Throwable = null
    @volatile var bErr: Throwable = null
    @volatile var aT: Thread = null
    @volatile var bT: Thread = null
    StatsMaintenance.testCrashPoint = p => {
      val t = Thread.currentThread()
      if ((t eq aT) && p == "marker-open") {
        aAtMarker.countDown()
        if (!bCommitted.await(120, TimeUnit.SECONDS))
          throw new IllegalStateException("drill: B never committed")
      }
      if ((t eq bT) && p == "post-marker") {
        bCommitted.countDown()
        if (!bGo.await(120, TimeUnit.SECONDS))
          throw new IllegalStateException("drill: B never released")
      }
    }
    try {
      aT = new Thread(() => try { foldLines(aRows, aId, path): Unit }
        catch { case e: Throwable => aErr = e }, "drill-a")
      bT = new Thread(() => try { foldLines(bRows, bId, path): Unit }
        catch { case e: Throwable => bErr = e }, "drill-b")
      aT.start()
      assert(aAtMarker.await(120, TimeUnit.SECONDS),
        "A never reached marker-open")
      bT.start()
      aT.join(120000)
      assert(!aT.isAlive, "A did not finish")
      bGo.countDown()
      bT.join(120000)
      assert(!bT.isAlive, "B did not finish")
    } finally {
      StatsMaintenance.testCrashPoint = _ => ()
      bCommitted.countDown(); bGo.countDown()
    }
    (aErr, bErr)
  }

  private def stored(path: String): Seq[(String, Long)] =
    StatsMaintenance.readStats(spark, path).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq

  private def dirs(path: String): Seq[String] =
    new java.io.File(path).listFiles().map(_.getName).sorted.toSeq

  private def writeMarker(dir: String, watermark: Long): Unit = {
    val w = new java.io.FileWriter(s"$dir/${StatsMaintenance.Marker}")
    try w.write(watermark.toString) finally w.close()
  }

  private def fileContent(f: String): String = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  private def markerContent(dir: String): String =
    fileContent(s"$dir/${StatsMaintenance.Marker}")

  private def sidecarContent(dir: String): String =
    fileContent(s"$dir/${StatsMaintenance.MarkerV1File}")

  test("marker format: the commit marker is the bare v0 watermark " +
    "long; the sidecar records watermark, writer nonce, and base ref " +
    "(base=none for the first version)") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    assert(markerContent(s"$path/v=0") == "0",
      "the commit marker must stay in the v0 bare-long format")
    val s0 = sidecarContent(s"$path/v=0")
    assert(s0.startsWith("v1 wm=0 nonce="), s0)
    assert(s0.endsWith(" base=none"), s0)
    val nonce0 = StatsMaintenance.parseMarker(s0) match {
      case Some(StatsMaintenance.MarkerV1(0L, n, None)) => n
      case other => fail(s"unexpected parse: $other")
    }
    assert(foldLines(batch2, 1L, path))
    assert(markerContent(s"$path/v=1") == "1")
    val s1 = sidecarContent(s"$path/v=1")
    // lineage: the new sidecar witnesses the exact (version, nonce) it
    // was derived from - what the post-commit classifier walks
    assert(StatsMaintenance.parseMarker(s1) ==
      Some(StatsMaintenance.MarkerV1(1L, StatsMaintenance.parseMarker(s1)
        .collect { case v: StatsMaintenance.MarkerV1 => v.nonce }.get,
        Some((0L, nonce0)))), s1)
  }

  test("format migration: a legacy (v0) store stays readable in place, " +
    "a publish on top records base=<n>:legacy, and replay skips still " +
    "work across mixed marker formats") {
    val path = tmpDir()
    // hand-build a v0-era store: bare-watermark markers
    linePartial(batch1).write.mode("overwrite").parquet(s"$path/v=0")
    writeMarker(s"$path/v=0", 0L)
    linePartial(batch1 ++ batch2).write.mode("overwrite")
      .parquet(s"$path/v=7")
    writeMarker(s"$path/v=7", 1L)
    // readable in place: newest committed version + its watermark
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(!foldLines(batch2, 1L, path), "replay must skip over v0 markers")
    // a new publish lands on top and records the legacy base by number
    assert(foldLines(batch3, 2L, path))
    assert(markerContent(s"$path/v=8") == "2")
    val m = sidecarContent(s"$path/v=8")
    assert(m.startsWith("v1 wm=2 nonce="), m)
    assert(m.endsWith(" base=7:legacy"), m)
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    assert(!foldLines(batch3, 2L, path))
  }

  test("v0 binary on a new-format store: every committed version reads " +
    "as committed with the right watermark under v0 parse rules, so a " +
    "v0 reader is correct and a v0 publisher's torn-prune never " +
    "touches committed data (the one-way-migration hazard is gone)") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    assert(foldLines(batch2, 1L, path, retain = 2))
    // leave a genuinely torn dir beside the committed ones — the only
    // thing a v0 prune may delete
    assert(new java.io.File(s"$path/v=9").mkdirs())
    assert(new java.io.File(s"$path/v=9/_GRAFT_RESERVED").createNewFile())
    // a faithful simulation of the v0 binary's read semantics: a
    // version is committed iff its _GRAFT_COMMITTED content parses as
    // a bare long (the original format; no sidecar, no data-beside)
    def v0Read(dir: java.io.File): Option[Long] = {
      val m = new java.io.File(dir, StatsMaintenance.Marker)
      if (!m.exists) None else fileContent(m.toString).trim.toLongOption
    }
    val byDir = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> v0Read(d)).toMap
    assert(byDir == Map("v=0" -> Some(0L), "v=1" -> Some(1L),
      "v=9" -> None), s"v0 parse of a new-format store drifted: $byDir")
    // v0 reader: current = max committed = v=1 with watermark 1 — and
    // its table read skips underscore files (the sidecar is invisible)
    assert(spark.read.parquet(s"$path/v=1")
      .as[(String, Long)].collect().sortBy(_._1).toSeq ==
      lineDfOf(batch1 ++ batch2))
    // v0 publisher: its prune deletes torn + superseded dirs only —
    // under v0 rules NOTHING committed reads as torn, so the committed
    // set it would preserve is exactly the real committed set
    val v0Torn = byDir.collect { case (d, None) => d }.toSet
    assert(v0Torn == Set("v=9"),
      "a committed version read as torn under v0 rules - a v0 " +
        "publisher would destroy committed data")
    // and a v0-style publish ON TOP of the new-format store (parquet +
    // bare marker, no sidecar) reads back as committed-legacy here,
    // with the next new-format fold recording base=<n>:legacy
    linePartial(batch1 ++ batch2 ++ batch3).write.mode("overwrite")
      .parquet(s"$path/v=2")
    writeMarker(s"$path/v=2", 2L)
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
    // the reservation probe starts past the torn v=9, so the fold
    // lands at v=10
    assert(foldLines(Seq((9L, "newer day")), 3L, path))
    assert(sidecarContent(s"$path/v=10").endsWith(" base=2:legacy"))
  }

  test("r16 interim single-file v1 markers stay readable in place, and " +
    "each new publish migrates the store toward full v0-readability " +
    "(retention prunes the interim-format versions)") {
    val path = tmpDir()
    // hand-build an r16-era store: the full v1 line INSIDE the marker
    linePartial(batch1).write.mode("overwrite").parquet(s"$path/v=0")
    val w = new java.io.FileWriter(s"$path/v=0/${StatsMaintenance.Marker}")
    try w.write("v1 wm=0 nonce=r16-writer base=none") finally w.close()
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L))
    assert(stored(path) == lineDfOf(batch1))
    assert(!foldLines(batch1, 0L, path), "replay must skip r16 markers")
    // a new fold records the r16 version's REAL nonce as its base (the
    // single-file parse still yields full lineage info)...
    assert(foldLines(batch2, 1L, path))
    assert(sidecarContent(s"$path/v=1").endsWith(" base=0:r16-writer"))
    // ...writes the two-file format, and retention (retain=1) has
    // pruned the interim-format version: the store is now fully
    // v0-parsable (every marker a bare long)
    assert(dirs(path) == Seq("v=1"), s"got: ${dirs(path)}")
    assert(markerContent(s"$path/v=1") == "1")
  }

  test("sidecar damage degrades to committed-legacy, never to torn or " +
    "a destructive repair: missing, garbled, and watermark-mismatched " +
    "sidecars all keep the version committed at the marker's watermark") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    val table = stored(path)
    val side = s"$path/v=0/${StatsMaintenance.MarkerV1File}"
    def asserts(): Unit = {
      assert(StatsMaintenance.lastFolded(spark, path).contains(0L))
      assert(stored(path) == table)
      assert(!foldLines(batch1, 0L, path), "replay skip must survive")
    }
    // the local ChecksumFileSystem keeps a .crc sibling; rewriting the
    // sidecar out-of-band makes its read throw ChecksumException —
    // which IS one of the damage modes (bit rot on a long-lived
    // store): first pin that the read failure itself degrades...
    val w1 = new java.io.FileWriter(side)
    try w1.write("v1 wm=trunca") finally w1.close()
    asserts()
    // ...then drop the stale checksum so the PARSE paths are exercised:
    // garbled content (a truncated foreign write)
    def dropCrc(): Unit =
      new java.io.File(s"$path/v=0/.${StatsMaintenance.MarkerV1File}.crc")
        .delete(): Unit
    dropCrc()
    asserts()
    // watermark mismatch (stale/foreign sidecar): the MARKER is the
    // commit point - its watermark wins, lineage is dropped
    val w2 = new java.io.FileWriter(side)
    try w2.write("v1 wm=7 nonce=imposter base=none") finally w2.close()
    dropCrc()
    asserts()
    // missing entirely (written by a v0 binary)
    assert(new java.io.File(side).delete())
    asserts()
    // a publish on top still lands, recording the unverifiable base
    assert(foldLines(batch2, 1L, path))
    assert(sidecarContent(s"$path/v=1").endsWith(" base=0:legacy"))
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
  }

  test("a version directory pruned mid-listing (the reader/prune race) " +
    "classifies as torn instead of crashing the scan") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    assert(foldLines(batch2, 1L, path, retain = 2))
    // the race: a concurrent retention prune deletes v=0 between the
    // store listing and the per-directory marker/data reads
    StatsMaintenance.testVersionsHook = p =>
      if (p.getName == "v=0") {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(s"$path/v=0"))
      }
    try {
      assert(StatsMaintenance.lastFolded(spark, path).contains(1L),
        "vanished directory must read as torn, not crash the scan")
      assert(stored(path) == lineDfOf(batch1 ++ batch2))
    } finally StatsMaintenance.testVersionsHook = _ => ()
  }

  test("crash after the sidecar lands but before the marker: the " +
    "version is torn (no marker = no commit) and re-delivery resumes") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    final class Killed extends RuntimeException("injected crash")
    StatsMaintenance.testCrashPoint =
      p => if (p == "post-sidecar") throw new Killed
    try intercept[Killed] { foldLines(batch2, 1L, path) }
    finally StatsMaintenance.testCrashPoint = _ => ()
    assert(new java.io.File(
      s"$path/v=1/${StatsMaintenance.MarkerV1File}").exists,
      "test setup: expected the sidecar to have landed")
    assert(!new java.io.File(
      s"$path/v=1/${StatsMaintenance.Marker}").exists)
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L))
    assert(stored(path) == lineDfOf(batch1))
    assert(foldLines(batch2, 1L, path))
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(dirs(path) == Seq("v=2"), s"torn sidecar debris: ${dirs(path)}")
  }

  test("a superseded directory already deleted by a foreign prune does " +
    "not fail the publish POST-COMMIT: any exception there reads as " +
    "retryable under the failure taxonomy and would invite a " +
    "double-apply (found by the cross-process storm probe)") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // this fold's marker has landed when a foreign prune deletes the
    // superseded v=0 under it — the fold's own prune then targets an
    // already-gone directory (fs.delete returns false)
    var fired = false
    StatsMaintenance.testCrashPoint = p =>
      if (p == "post-marker" && !fired) {
        fired = true
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(s"$path/v=0"))
      }
    try assert(foldLines(batch2, 1L, path),
      "publish must complete cleanly when its prune target is already gone")
    finally StatsMaintenance.testCrashPoint = _ => ()
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(dirs(path) == Seq("v=1"), s"got: ${dirs(path)}")
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
  }

  test("visibleLineage walks the nonce-verified base-ref chain: " +
    "complete roots, pruned intermediates, legacy gaps, and a re-used " +
    "slot all classify as documented") {
    import StatsMaintenance.{LegacyMarker, MarkerV1, visibleLineage}
    def v1(wm: Long, n: String, base: Option[(Long, String)]) =
      MarkerV1(wm, n, base)
    // full chain to the empty-store root: everything proven on-lineage
    val full = Map[Long, StatsMaintenance.MarkerInfo](
      0L -> v1(0, "n0", None),
      1L -> v1(1, "n1", Some((0L, "n0"))),
      2L -> v1(2, "n2", Some((1L, "n1"))))
    assert(visibleLineage(full) ==
      (Map(2L -> Some("n2"), 1L -> Some("n1"), 0L -> Some("n0")), true))
    // pruned intermediate: the ref witnesses (1, n1) but the walk
    // cannot continue below it - incomplete, so absences are UNKNOWN
    val pruned = Map[Long, StatsMaintenance.MarkerInfo](
      2L -> v1(2, "n2", Some((1L, "n1"))))
    assert(visibleLineage(pruned) ==
      (Map(2L -> Some("n2"), 1L -> Some("n1")), false))
    // legacy marker at the top: no lineage info at all
    assert(visibleLineage(Map[Long, StatsMaintenance.MarkerInfo](
        2L -> LegacyMarker(5))) ==
      (Map(2L -> None), false))
    // legacy base ref: the base's NUMBER is witnessed, nonce is not,
    // and the walk stops (cannot verify what sits below a v0 marker)
    val viaLegacy = Map[Long, StatsMaintenance.MarkerInfo](
      1L -> LegacyMarker(0),
      2L -> v1(2, "n2", Some((1L, "legacy"))))
    assert(visibleLineage(viaLegacy) ==
      (Map(2L -> Some("n2"), 1L -> None), false))
    // re-used slot mid-chain: version 1 was pruned and its number
    // re-committed by another writer (nonce mismatch) - the witnessed
    // ref stays, the LISTED impostor is not walked through, and the
    // chain is incomplete (version 0 must NOT read as shadowed)
    val reused = Map[Long, StatsMaintenance.MarkerInfo](
      0L -> v1(0, "n0", None),
      1L -> v1(1, "impostor", Some((0L, "n0"))),
      2L -> v1(2, "n2", Some((1L, "n1"))))
    assert(visibleLineage(reused) ==
      (Map(2L -> Some("n2"), 1L -> Some("n1")), false))
    assert(visibleLineage(Map.empty) == (Map.empty, false))
    // tampered/corrupt store: a self-referential (or forward) base ref
    // must STOP the walk unverifiable, not loop forever — honest
    // writers always record a strictly older base (reserve probes from
    // max committed + 1)
    assert(visibleLineage(Map[Long, StatsMaintenance.MarkerInfo](
        2L -> v1(5, "x", Some((2L, "x"))))) ==
      (Map(2L -> Some("x")), false))
    assert(visibleLineage(Map[Long, StatsMaintenance.MarkerInfo](
        1L -> v1(1, "a", Some((2L, "b"))),
        2L -> v1(2, "b", Some((1L, "a"))))) ==
      (Map(2L -> Some("b"), 1L -> Some("a")), false))
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

  test("an EMPTY or garbage commit marker is a torn version, not a " +
    "bricked store: readers fall back, the next fold prunes it") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    val before = stored(path)
    // the ADVICE window: a crash between fs.create(marker) and the
    // content write leaves a marker FILE with no parsable content —
    // once, this threw NumberFormatException on every subsequent read
    batch2.toDF("doc_id", "text")
      .select(trim(col("text")).as("line_key"), lit(1L).as("line_df"))
      .write.mode("overwrite").parquet(s"$path/v=1")
    new java.io.File(s"$path/v=1/${StatsMaintenance.Marker}").createNewFile()
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L),
      "empty marker must read as torn, not throw")
    assert(stored(path) == before, "empty-marker version leaked into a read")
    // garbage content is the same window with a partial write
    val w = new java.io.FileWriter(s"$path/v=1/${StatsMaintenance.Marker}")
    try w.write("12\u0000garbage") finally w.close()
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L))
    assert(stored(path) == before)
    // safe to discard: the engine never committed batch 1's offsets,
    // so it re-delivers — the fold publishes past the debris
    assert(foldLines(batch2, 1L, path))
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(dirs(path) == Seq("v=2"), s"torn-marker debris survived: ${dirs(path)}")
  }

  test("REAL torn-marker crash: killing publish between marker create " +
    "and content write leaves a store the restart absorbs") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    final class Killed extends RuntimeException("injected crash")
    StatsMaintenance.testCrashPoint =
      p => if (p == "marker-open") throw new Killed
    try intercept[Killed] { foldLines(batch2, 1L, path) }
    finally StatsMaintenance.testCrashPoint = _ => ()
    // the crash left a created-but-empty marker (the finally closed the
    // stream before any content landed) — must parse as torn
    val torn = new java.io.File(s"$path/v=1/${StatsMaintenance.Marker}")
    assert(torn.exists && torn.length == 0, "test setup: expected empty marker")
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L))
    assert(stored(path) == lineDfOf(batch1))
    // restart: the engine re-delivers batch 1 (offsets never committed)
    assert(foldLines(batch2, 1L, path))
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(dirs(path) == Seq("v=2"))
  }

  test("single-writer guard: a writer that committed under an " +
    "in-flight fold makes the fold LOSE LOUDLY - no silent lost update") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // interleave deterministically: once the fold's parquet is written
    // but unmarked, an offline retraction commits under it
    var fired = false
    StatsMaintenance.testCrashPoint = p =>
      if (p == "post-parquet" && !fired) {
        fired = true
        StatsMaintenance.retractBatch(spark, path,
          CorpusStats.lineDf(batch1.toDF("doc_id", "text"), "doc_id", "text"),
          Seq("line_key"), Seq("line_df"))
      }
    val e =
      try intercept[IllegalStateException] { foldLines(batch2, 1L, path) }
      finally StatsMaintenance.testCrashPoint = _ => ()
    assert(e.getMessage.contains("concurrent writer"))
    // exactly one writer won (the retraction); the loser left no debris
    // and nothing was double-counted
    assert(stored(path).isEmpty, "retraction's win was clobbered")
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L),
      "retraction must not advance the watermark")
    // the lost fold is re-delivered on restart and folds cleanly
    assert(foldLines(batch2, 1L, path))
    assert(stored(path) == lineDfOf(batch2))
  }

  test("pruned-while-torn (the round-14 'post-commit detector' " +
    "interleave, relabeled honestly): a foreign writer that commits " +
    "AND prunes inside the marker window deletes this publish's torn " +
    "dir, so its delta never lands - it must fail RETRYABLE, not " +
    "post-commit") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // the fold's re-validation has passed and its marker file is
    // created but EMPTY when an offline retraction runs to COMPLETION:
    // the retraction's prune judges the fold's version torn and
    // deletes the directory, so the fold's marker content lands on an
    // unlinked file - the fold's delta is NOT committed. Round 14
    // raised PostCommitConflictException here, whose contract says
    // "your version IS committed" - a lie with repair consequences
    // (the runbook would retract a delta that never landed).
    var fired = false
    StatsMaintenance.testCrashPoint = p =>
      if (p == "marker-open" && !fired) {
        fired = true
        StatsMaintenance.retractBatch(spark, path, linePartial(batch1),
          Seq("line_key"), Seq("line_df"))
      }
    val e =
      try intercept[IllegalStateException] { foldLines(batch2, 1L, path) }
      finally StatsMaintenance.testCrashPoint = _ => ()
    assert(!e.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      "pruned-while-torn must NOT raise the non-retryable type: the " +
        "delta did not commit and the runbook would mis-repair")
    assert(e.getMessage.contains("did NOT commit"), e.getMessage)
    // the retraction's commit survives; the fold's delta is absent
    assert(stored(path).isEmpty, "retraction's win was clobbered")
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L),
      "retraction must not advance the watermark")
    // retryable for real: re-delivery folds the lost batch cleanly
    // (legitimate ONLY because the type says the delta did not land)
    assert(foldLines(batch2, 1L, path))
    assert(stored(path) == lineDfOf(batch2))
  }

  test("BOTH-COMMIT drill (same batch, two drivers): each publish " +
    "raises the post-commit type, the visible table is already exact, " +
    "a naive re-apply retry double-counts, and retracting ONE delta " +
    "repairs it back to the recompute") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    val (aErr, bErr) = bothCommitDrill(path, batch2, 1L, batch2, 1L)
    assert(aErr.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      s"writer A: expected the post-commit type, got $aErr")
    assert(bErr.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      s"writer B: expected the post-commit type, got $bErr")
    // SAME batch => identical deltas: the visible (highest) version is
    // already exact, the conflict left duplicate VERSIONS, not
    // duplicate counts
    assert(stored(path) == lineDfOf(batch1 ++ batch2),
      "same-batch both-commit corrupted the visible table")
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
    // the naive reaction the contract forbids - "a publish threw, so
    // re-apply my delta" - double-counts, and the additive merge
    // cannot notice (BOILER: true df 4 across batch1+batch2, 2 of it
    // from batch2, so the double-apply inflates it to 6)
    StatsMaintenance.refoldBatch(spark, path, linePartial(batch2),
      Seq("line_key"), Seq("line_df"), batchId = 1L)
    val doubled = stored(path)
    assert(doubled != lineDfOf(batch1 ++ batch2),
      "double-apply demonstration failed to corrupt")
    assert(doubled.find(_._1 == "BOILER").map(_._2).contains(6L),
      s"expected BOILER df doubled-applied to 6, got $doubled")
    // the runbook repair: retract ONE of the two applied deltas
    StatsMaintenance.retractBatch(spark, path, linePartial(batch2),
      Seq("line_key"), Seq("line_df"))
    assert(stored(path) == lineDfOf(batch1 ++ batch2),
      "repair drifted from the recompute")
    assert(StatsMaintenance.lastFolded(spark, path).contains(1L))
    // normal operation resumes: replays skip, new batches fold
    assert(!foldLines(batch2, 1L, path))
    assert(foldLines(batch3, 2L, path))
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
  }

  test("BOTH-COMMIT drill (different batches): the shadowed delta is " +
    "ABSENT from the visible table, foldBatch cannot repair it (the " +
    "watermark skip absorbs it), and refoldBatch restores recompute " +
    "equality exactly") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // operator error: two uncoordinated fold drivers, DIFFERENT
    // batches. A folds batch 1, B folds batch 2; both commit.
    val (aErr, bErr) = bothCommitDrill(path, batch2, 1L, batch3, 2L)
    assert(aErr.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      s"writer A: expected the post-commit type, got $aErr")
    assert(bErr.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      s"writer B: expected the post-commit type, got $bErr")
    // SIBLING topology, classified: both writers derived from the same
    // base (v0), so the loser's version (v1, A's) is SHADOWED and the
    // winner's (v2, B's) is VISIBLE - both messages must say which
    // delta needs the refold, not just that a conflict exists
    assert(aErr.getMessage.contains("v1[this publish: SHADOWED"),
      s"A must learn its own delta is shadowed: ${aErr.getMessage}")
    assert(aErr.getMessage.contains("v2[VISIBLE]"), aErr.getMessage)
    assert(bErr.getMessage.contains("v1[SHADOWED"),
      s"B must learn the foreign delta is shadowed: ${bErr.getMessage}")
    assert(bErr.getMessage.contains("v2[this publish: VISIBLE]"),
      bErr.getMessage)
    // readers see only the HIGHEST committed version = B's table,
    // which was derived from the shared base: batch2's committed
    // delta is SHADOWED - absent from every read - and the visible
    // watermark (2) claims it was absorbed
    assert(stored(path) == lineDfOf(batch1 ++ batch3),
      "expected the visible table to hold base + B's delta only")
    assert(stored(path) != lineDfOf(batch1 ++ batch2 ++ batch3))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    // foldBatch CANNOT repair: id 1 <= watermark 2 is replay-skipped,
    // silently losing the delta again - the runbook forbids it
    assert(!foldLines(batch2, 1L, path),
      "foldBatch must refuse the shadowed id (watermark skip)")
    assert(stored(path) == lineDfOf(batch1 ++ batch3))
    // the runbook repair: force-refold the shadowed delta's partial
    StatsMaintenance.refoldBatch(spark, path, linePartial(batch2),
      Seq("line_key"), Seq("line_df"), batchId = 1L)
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3),
      "refold repair drifted from the recompute")
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L),
      "repairing an OLDER shadowed delta must not move the watermark back")
    // normal operation resumes
    assert(!foldLines(batch3, 2L, path))
    assert(foldLines(Seq((7L, "post repair doc")), 3L, path))
  }

  test("a marker-only directory (parquet pruned, path resurrected by " +
    "the marker create) is TORN, not committed: readers stay on the " +
    "last real table instead of throwing on the empty husk") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // hand-build the end state of the seamless-window race: a foreign
    // prune deleted this publish's parquet between its re-validation
    // and its marker create, so fs.create resurrected v=1 and the
    // marker content landed in a directory with NO data files. Before
    // the data-beside-marker rule, v=1 was the max COMMITTED version
    // and every readStats/foldBatch threw on it (store bricked until
    // manual repair).
    assert(new java.io.File(s"$path/v=1").mkdirs())
    val w = new java.io.FileWriter(s"$path/v=1/${StatsMaintenance.Marker}")
    try w.write("v1 wm=1 nonce=orphaned-writer base=0:whatever")
    finally w.close()
    assert(StatsMaintenance.lastFolded(spark, path).contains(0L),
      "marker-only directory must read as torn, not as the watermark")
    assert(stored(path) == lineDfOf(batch1),
      "readers must stay on the last REAL table")
    // the batch the orphaned writer was publishing is re-delivered
    // (retryable per its self check) and folds past the husk, which is
    // pruned like any torn debris
    assert(foldLines(batch2, 1L, path))
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
    assert(dirs(path) == Seq("v=2"), s"husk not pruned: ${dirs(path)}")
  }

  test("DESCENDANT topology, witnessed through the pruned directory: " +
    "a fast foreign writer that derives FROM this commit and prunes " +
    "its directory must yield the post-commit type (absorbed, no data " +
    "lost), NOT the retryable lie that invites a double-apply") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // A's marker content has landed (post-marker) when a foreign fold
    // reads the store: it sees A's version COMMITTED, derives from it,
    // publishes, and its retain=1 prune deletes A's directory - all
    // before A's own post-commit re-list runs. Pre-v1 markers had no
    // lineage, so this read as "your dir is gone, you did not commit,
    // retry" - and the retry would double-apply a delta that IS in the
    // visible table (via the descendant). The v1 base ref is the
    // witness that survives the prune.
    var fired = false
    StatsMaintenance.testCrashPoint = p =>
      if (p == "post-marker" && !fired) {
        fired = true
        assert(foldLines(batch3, 2L, path),
          "the in-window descendant fold must land")
      }
    val e = try intercept[IllegalStateException] {
        foldLines(batch2, 1L, path)
      } finally StatsMaintenance.testCrashPoint = _ => ()
    assert(e.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      s"witnessed commit must raise the non-retryable type, got: $e")
    assert(e.getMessage.contains("do NOT retry"), e.getMessage)
    assert(e.getMessage.contains("absorbed into the visible lineage"),
      e.getMessage)
    assert(!e.getMessage.contains("did NOT commit"), e.getMessage)
    // no data lost: the visible table holds base + A's delta + the
    // descendant's delta, and the watermark covers both batches
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3),
      "descendant topology lost a delta")
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    // the contract-mandated reaction (do nothing) leaves a store that
    // resumes normally; the forbidden reaction (refold) would
    // double-apply - pinned by the BOTH-COMMIT same-batch drill
    assert(!foldLines(batch2, 1L, path))
    assert(foldLines(Seq((8L, "after the storm")), 3L, path))
  }

  test("slot re-use cannot impersonate this publish (nonce check), and " +
    "a foreign COMMITTED version occupying the slot is never deleted") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // A pauses with its marker created but EMPTY; a retraction commits
    // and prunes A's torn v=1; then a third writer re-reserves the SAME
    // version number and commits with the SAME watermark A was
    // publishing (hand-built here). The pre-nonce self check compared
    // (version, watermark) - it would have judged 'self committed'
    // (wrong: A's delta is on an unlinked inode) or, on watermark
    // mismatch, DELETED the third writer's committed version.
    var fired = false
    StatsMaintenance.testCrashPoint = p =>
      if (p == "marker-open" && !fired) {
        fired = true
        StatsMaintenance.retractBatch(spark, path, linePartial(batch1),
          Seq("line_key"), Seq("line_df"))
        // third writer: same slot, same watermark, its own nonce
        linePartial(batch3).write.mode("overwrite").parquet(s"$path/v=1")
        val w = new java.io.FileWriter(
          s"$path/v=1/${StatsMaintenance.Marker}")
        try w.write("v1 wm=1 nonce=foreign-3rd-writer base=0:unknowable")
        finally w.close()
      }
    val e = try intercept[IllegalStateException] {
        foldLines(batch2, 1L, path)
      } finally StatsMaintenance.testCrashPoint = _ => ()
    // A's delta never committed (its marker content landed on the
    // unlinked file): retryable, and NOT the post-commit type
    assert(!e.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      s"impersonated slot must not read as self-committed: $e")
    assert(e.getMessage.contains("did NOT commit"), e.getMessage)
    assert(e.getMessage.contains("left untouched"), e.getMessage)
    // the foreign committed version in the slot was NOT destroyed
    assert(StatsMaintenance.parseMarker(markerContent(s"$path/v=1")) ==
      Some(StatsMaintenance.MarkerV1(1L, "foreign-3rd-writer",
        Some((0L, "unknowable")))),
      "the foreign committed version was deleted or damaged")
    // readers keep working off the highest committed version
    assert(StatsMaintenance.readStats(spark, path).isDefined)
  }

  test("retraction racing a LIVE fold: a fold that commits under a " +
    "mid-publish retraction makes the retraction abort PRE-COMMIT " +
    "(retryable), and the retried retraction lands exactly") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    assert(foldLines(batch2, 1L, path))
    // the retraction's parquet is written but unmarked when a live
    // stream fold commits a NEW batch under it
    var fired = false
    StatsMaintenance.testCrashPoint = p =>
      if (p == "post-parquet" && !fired) {
        fired = true
        assert(foldLines(batch3, 2L, path), "in-window fold must commit")
      }
    val e = try intercept[IllegalStateException] {
        StatsMaintenance.retractBatch(spark, path, linePartial(batch1),
          Seq("line_key"), Seq("line_df"))
      } finally StatsMaintenance.testCrashPoint = _ => ()
    assert(!e.isInstanceOf[StatsMaintenance.PostCommitConflictException],
      "pre-commit abort must stay retryable")
    assert(e.getMessage.contains("lost update"), e.getMessage)
    // the fold's commit survives intact...
    assert(stored(path) == lineDfOf(batch1 ++ batch2 ++ batch3))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    // ...and the retraction, retried against fresh state, lands exactly
    StatsMaintenance.retractBatch(spark, path, linePartial(batch1),
      Seq("line_key"), Seq("line_df"))
    assert(stored(path) == lineDfOf(batch2 ++ batch3))
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L),
      "retraction must not move the watermark")
  }

  test("two writers can never share a version directory: the " +
    "reservation is exclusive and the loser moves past it") {
    val path = tmpDir()
    assert(foldLines(batch1, 0L, path))
    // a concurrent writer reserved v=1 (its parquet still in flight)
    assert(new java.io.File(s"$path/v=1").mkdirs())
    assert(new java.io.File(s"$path/v=1/_GRAFT_RESERVED").createNewFile())
    // our fold must mint v=2, not write into the reserved dir...
    assert(foldLines(batch2, 1L, path))
    assert(StatsMaintenance.readStats(spark, path).isDefined)
    // ...and the reserved-only dir was torn debris by then — pruned
    assert(dirs(path) == Seq("v=2"), s"got: ${dirs(path)}")
    assert(stored(path) == lineDfOf(batch1 ++ batch2))
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

    // the count-min sketch (fifth shape, two-column key): counters of
    // folded disjoint batches equal the one-pass sketch of the union —
    // fixed-space frequency maintenance over an unbounded stream
    val path3 = tmpDir()
    def foldSketch(rows: Seq[(Long, String)], id: Long): Boolean =
      StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id, path3,
        Seq("d", "bucket"), Seq("n"),
        b => CorpusStats.countMinSketch(b, "text", depth = 3, width = 32))
    assert(foldSketch(batch1, 0L) && foldSketch(batch2, 1L))
    assert(!foldSketch(batch1, 0L), "replayed sketch batch must skip")
    val skGot = StatsMaintenance.readStats(spark, path3).get
      .as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val skFull = CorpusStats.countMinSketch(
        (batch1 ++ batch2).toDF("doc_id", "text"), "text", 3, 32)
      .as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(skGot == skFull)
  }

  test("sixth shape end-to-end: token occurrence counts fold through " +
    "the store, and whole-stream heavy hitters computed from BOTH " +
    "maintained shapes equal the plain recompute") {
    val countsPath = tmpDir()
    val sketchPath = tmpDir()
    def foldBoth(rows: Seq[(Long, String)], id: Long): Unit = {
      assert(StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id,
        countsPath, Seq("token"), Seq("n"),
        b => CorpusStats.tokenCounts(b, "text")))
      assert(StatsMaintenance.foldBatch(rows.toDF("doc_id", "text"), id,
        sketchPath, Seq("d", "bucket"), Seq("n"),
        b => CorpusStats.countMinSketch(b, "text", depth = 2, width = 2)))
    }
    foldBoth(batch1, 0L)
    foldBoth(batch2, 1L)
    // replay skips both stores in lockstep
    assert(!StatsMaintenance.foldBatch(batch2.toDF("doc_id", "text"), 1L,
      countsPath, Seq("token"), Seq("n"),
      b => CorpusStats.tokenCounts(b, "text")))
    val history = StatsMaintenance.readStats(spark, countsPath).get
    val sketch = StatsMaintenance.readStats(spark, sketchPath).get
    val today = batch3.toDF("doc_id", "text")
    val got = CorpusStats.heavyHittersOverStream(today, "text",
        history, sketch, depth = 2, width = 2, threshold = 2L)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val want = CorpusStats.tokenCounts(
        (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"), "text")
      .where(col("n") >= 2)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(want.nonEmpty, "degenerate fixture: no heavy tokens")
    assert(got == want, s"maintained composition drifted: $got vs $want")
  }

  test("seventh shape end-to-end: per-source tallies fold through the " +
    "store, a day retracts exactly (emptied sources vanish), and the " +
    "mix-planning consumer reads the maintained table alone") {
    val path = tmpDir()
    val day1 = Seq(("wiki", "alpha beta gamma", 16L),
      ("crawl", "x y", 3L), ("books", "one two three four", 18L))
    val day2 = Seq(("wiki", "delta", 5L), ("crawl", "z", 1L))
    val day3 = Seq(("crawl", "p q r s", 7L), ("forum", "hello there", 11L))
    def tallies(rows: Seq[(String, String, Long)]): DataFrame =
      CorpusStats.sourceTallies(rows.toDF("source", "text", "n_chars"),
        "source", "text", "n_chars")
    def fold(rows: Seq[(String, String, Long)], id: Long): Boolean =
      StatsMaintenance.foldBatch(rows.toDF("source", "text", "n_chars"),
        id, path, Seq("source"), Seq("n_docs", "n_tokens", "char_mass"),
        b => CorpusStats.sourceTallies(b, "source", "text", "n_chars"))
    def storedTallies(): Seq[(String, Long, Long, Long)] =
      StatsMaintenance.readStats(spark, path).get
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def recompute(rows: Seq[(String, String, Long)])
        : Seq[(String, Long, Long, Long)] =
      tallies(rows).as[(String, Long, Long, Long)].collect()
        .sortBy(_._1).toSeq
    assert(fold(day1, 0L) && fold(day2, 1L) && fold(day3, 2L))
    assert(!fold(day2, 1L), "replayed tally batch must skip")
    assert(storedTallies() == recompute(day1 ++ day2 ++ day3))
    // day 2 is deleted: wiki/crawl shrink, watermark holds
    StatsMaintenance.retractBatch(spark, path, tallies(day2),
      Seq("source"), Seq("n_docs", "n_tokens", "char_mass"))
    assert(storedTallies() == recompute(day1 ++ day3),
      "tally retraction drifted from the survivors' recompute")
    assert(StatsMaintenance.lastFolded(spark, path).contains(2L))
    // a source emptied by retraction vanishes entirely
    StatsMaintenance.retractBatch(spark, path,
      tallies(Seq(day3(1))), Seq("source"),
      Seq("n_docs", "n_tokens", "char_mass"))
    assert(!storedTallies().exists(_._1 == "forum"),
      "emptied source must vanish from the maintained table")
    // the selection consumer runs off the maintained table alone and
    // equals the plan computed from the survivors' recompute
    val got = Sampling.mixPlanWith(
        StatsMaintenance.readStats(spark, path).get)
      .orderBy("source").collect().toSeq
    val want = Sampling.mixPlanWith(
        tallies(day1 ++ day3.take(1)))
      .orderBy("source").collect().toSeq
    assert(got == want, s"mix plan drifted: $got vs $want")
    // and its temperature columns match the from-scratch operator
    val direct = Sampling.temperatureMixTable(
        (day1 ++ day3.take(1)).toDF("source", "text", "n_chars"),
        col("source"))
      .orderBy("source").collect().toSeq
    val planTemp = Sampling.mixPlanWith(tallies(day1 ++ day3.take(1)))
      .select("source", "n_docs", "sqrt_weight", "natural_pm",
        "target_pm", "copies_pm")
      .orderBy("source").collect().toSeq
    assert(planTemp == direct,
      "mixPlanWith temperature columns drifted from temperatureMixTable")
  }
}
