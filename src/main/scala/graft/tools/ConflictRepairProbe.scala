package graft.tools

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats
import graft.streaming.StatsMaintenance

/** The [[graft.streaming.StatsMaintenance.PostCommitConflictException]]
  * repair drill AT SCALE — the round-14 verdict's one
  * documented-but-untested recovery procedure, executed for real on
  * the Zipf decade (sf10z, 500k docs) with the sixth maintained shape
  * (exact token occurrence counts):
  *
  *  1. MANUFACTURE the both-committed state deterministically: two
  *     drivers fold into one store, interleaved through the
  *     testCrashPoint seam so writer B's marker content lands inside
  *     writer A's re-validate→marker window and BOTH versions commit
  *     (the race the store detects but cannot prevent without a
  *     filesystem CAS). Both writers must raise the dedicated
  *     non-retryable type.
  *  2. SAME-BATCH conflict (two drivers racing one micro-batch): the
  *     deltas were identical, so the visible table is already exact —
  *     prove it against the full recompute — and then demonstrate the
  *     failure the contract warns about: a naive "publish threw, so
  *     re-apply my delta" retry DOUBLE-COUNTS (recompute inequality +
  *     a sampled token's count inflated by exactly the batch's
  *     contribution), which the runbook's retract-one-delta repair
  *     restores to recompute equality exactly.
  *  3. DIFFERENT-BATCH conflict (two uncoordinated fold drivers): the
  *     shadowed delta is ABSENT from every read and the visible
  *     watermark claims it was absorbed, so
  *     [[graft.streaming.StatsMaintenance.foldBatch]] replay-skips it
  *     (proved) — the runbook's
  *     [[graft.streaming.StatsMaintenance.refoldBatch]] force-merge
  *     restores recompute equality exactly, without moving the
  *     watermark backwards.
  *
  * Reference semantics preserved: the K6 idempotent-replay watermark
  * contract (`/root/reference/internal/repository/scraper_status.go:10-27`)
  * — progress recorded WITH the write — which is exactly why the
  * watermark cannot double as the repair mechanism: it proves a batch
  * id's publish WON a race, not that its delta is in the visible
  * table.
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.ConflictRepairProbe'
  * }}}
  */
object ConflictRepairProbe {

  private def tokenPartial(df: DataFrame): DataFrame =
    CorpusStats.tokenCounts(df, "text")

  private def fold(df: DataFrame, id: Long, path: String): Boolean =
    StatsMaintenance.foldBatch(df, id, path, Seq("token"), Seq("n"),
      tokenPartial)

  private def tableEq(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** Two writers, one store: A pauses with its marker created but
    * empty, B publishes through its commit point and pauses before
    * its post-commit check (so its prune cannot delete A's torn dir),
    * A's content lands, then both post-commit checks run.
    */
  private def bothCommit(path: String, aDf: DataFrame, aId: Long,
      bDf: DataFrame, bId: Long): (Throwable, Throwable) = {
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
        if (!bCommitted.await(300, TimeUnit.SECONDS))
          throw new IllegalStateException("drill: B never committed")
      }
      if ((t eq bT) && p == "post-marker") {
        bCommitted.countDown()
        if (!bGo.await(300, TimeUnit.SECONDS))
          throw new IllegalStateException("drill: B never released")
      }
    }
    try {
      aT = new Thread(() => try { fold(aDf, aId, path): Unit }
        catch { case e: Throwable => aErr = e }, "conflict-a")
      bT = new Thread(() => try { fold(bDf, bId, path): Unit }
        catch { case e: Throwable => bErr = e }, "conflict-b")
      aT.start()
      require(aAtMarker.await(300, TimeUnit.SECONDS), "A never reached marker")
      bT.start()
      aT.join(300000)
      require(!aT.isAlive, "A did not finish")
      bGo.countDown()
      bT.join(300000)
      require(!bT.isAlive, "B did not finish")
    } finally {
      StatsMaintenance.testCrashPoint = _ => ()
      bCommitted.countDown(); bGo.countDown()
    }
    (aErr, bErr)
  }

  private def isConflict(e: Throwable): Boolean =
    e.isInstanceOf[StatsMaintenance.PostCommitConflictException]

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

    val dir = sys.env.getOrElse("PACK_DIR", "target/testdata/sf10z")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batches = (0 to 3).map(r => docs.where(col("doc_id") % 4 === r))
    println(s"[conflict-repair] dir=$dir docs=${docs.count()}")

    def freshStore(prefix: String, upTo: Int): String = {
      val p = java.nio.file.Files.createTempDirectory(prefix).toString
      (0 to upTo).foreach(i => require(fold(batches(i), i.toLong, p)))
      p
    }
    def maintained(p: String): DataFrame =
      StatsMaintenance.readStats(spark, p).get
    def recompute(ixs: Seq[Int]): DataFrame =
      tokenPartial(ixs.map(batches).reduce(_ unionByName _))

    // ---- drill 1: same batch, two racing drivers --------------------
    var t0 = System.nanoTime()
    val store1 = freshStore("graft-conflict1", 1)
    val (a1, b1) = bothCommit(store1, batches(2), 2L, batches(2), 2L)
    require(isConflict(a1), s"writer A: expected post-commit type, got $a1")
    require(isConflict(b1), s"writer B: expected post-commit type, got $b1")
    println(f"[conflict-repair] same-batch: BOTH writers flagged " +
      f"post-commit (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    require(tableEq(maintained(store1), recompute(0 to 2)),
      "same-batch: visible table must already equal the recompute " +
        "(identical deltas)")
    require(StatsMaintenance.lastFolded(spark, store1).contains(2L))
    println("[conflict-repair] same-batch: visible table == recompute " +
      "(conflict duplicated VERSIONS, not counts) .. PASS")

    // the forbidden naive retry: "a publish threw, re-apply my delta"
    t0 = System.nanoTime()
    // sample the Zipf head: the corpus's single most frequent token
    val probe = recompute(0 to 2).orderBy(col("n").desc).limit(1)
      .collect()(0).getString(0)
    def countOf(df: DataFrame): Long =
      df.where(col("token") === probe).select(coalesce(sum(col("n")),
        lit(0L))).collect()(0).getLong(0)
    val trueN = countOf(recompute(0 to 2))
    val batchN = countOf(tokenPartial(batches(2)))
    StatsMaintenance.refoldBatch(spark, store1, tokenPartial(batches(2)),
      Seq("token"), Seq("n"), batchId = 2L)
    val naiveN = countOf(maintained(store1))
    require(naiveN == trueN + batchN && batchN > 0,
      s"expected the naive retry to inflate '$probe' by the batch's " +
        s"$batchN, got $naiveN vs true $trueN")
    require(!tableEq(maintained(store1), recompute(0 to 2)))
    println(f"[conflict-repair] naive retry DOUBLE-APPLIED: '$probe' " +
      f"$trueN -> $naiveN (batch delta $batchN) " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s) .. demonstrated")

    // the runbook repair: retract one of the two applied deltas
    t0 = System.nanoTime()
    StatsMaintenance.retractBatch(spark, store1, tokenPartial(batches(2)),
      Seq("token"), Seq("n"))
    require(tableEq(maintained(store1), recompute(0 to 2)),
      "retract-one-delta repair drifted from the recompute")
    require(StatsMaintenance.lastFolded(spark, store1).contains(2L))
    require(fold(batches(3), 3L, store1), "post-repair fold must land")
    require(tableEq(maintained(store1), recompute(0 to 3)))
    println(f"[conflict-repair] retract-one-delta repair: maintained == " +
      f"recompute exactly, normal folds resume " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s) .. PASS")

    // ---- drill 2: different batches, two uncoordinated drivers ------
    t0 = System.nanoTime()
    val store2 = freshStore("graft-conflict2", 0)
    val (a2, b2) = bothCommit(store2, batches(1), 1L, batches(2), 2L)
    require(isConflict(a2) && isConflict(b2),
      s"different-batch: both writers must flag post-commit ($a2 / $b2)")
    // the shadowed delta (batch 1) is absent from every read and the
    // watermark (2) claims it was absorbed
    require(tableEq(maintained(store2), recompute(Seq(0, 2))),
      "expected the visible table to hold base + B's delta only")
    require(!tableEq(maintained(store2), recompute(0 to 2)))
    require(StatsMaintenance.lastFolded(spark, store2).contains(2L))
    require(!fold(batches(1), 1L, store2),
      "foldBatch must replay-skip the shadowed id - it cannot repair")
    println(f"[conflict-repair] different-batch: shadowed delta absent, " +
      f"watermark lies, foldBatch absorbs the repair attempt " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s) .. demonstrated")
    t0 = System.nanoTime()
    StatsMaintenance.refoldBatch(spark, store2, tokenPartial(batches(1)),
      Seq("token"), Seq("n"), batchId = 1L)
    require(tableEq(maintained(store2), recompute(0 to 2)),
      "refoldBatch repair drifted from the recompute")
    require(StatsMaintenance.lastFolded(spark, store2).contains(2L),
      "repair must not move the watermark backwards")
    require(fold(batches(3), 3L, store2))
    require(tableEq(maintained(store2), recompute(0 to 3)))
    println(f"[conflict-repair] refoldBatch repair: maintained == " +
      f"recompute exactly, watermark stable, normal folds resume " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1f s) .. PASS")

    println("[conflict-repair] ALL PASS")
    spark.stop()
  }
}
