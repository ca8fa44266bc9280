package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusStats, Sampling}
import graft.streaming.StatsMaintenance

/** Multi-store isolation soak — the realistic multi-corpus deployment
  * the single-store proofs never exercised: ONE driver maintaining TWO
  * independent stats stores (different shapes, different schedules)
  * with interleaved folds, one injected kill per store at a different
  * crash window, and a mid-week retraction against one store only.
  * The single-writer contract is PER STORE; nothing here violates it
  * (the driver is one writer that alternates), so every fold must land
  * and the stores must never see each other:
  *
  *  - store A: the SIXTH shape (exact token counts, Heaps-sized) over
  *    a 7-day split of the Zipf decade, folded daily;
  *  - store B: the SEVENTH shape (per-source doc/token/char tallies,
  *    source-bounded) over the same days, folded on a LAGGED schedule
  *    interleaved with A's;
  *  - kill A's day-3 fold at post-parquet (before its re-validate) and
  *    B's day-2 fold at marker-open (marker created, content not yet
  *    landed) — each retried as the engine would redeliver; after each
  *    kill the OTHER store's version listing and watermark must be
  *    byte-identical to its pre-kill snapshot;
  *  - day 4: retract B's day-1 tallies (deletion maintenance) — A's
  *    snapshot must again be untouched, B's watermark must not move;
  *  - end state: A ≡ token-count recompute over ALL 7 days, B ≡ tally
  *    recompute over its SURVIVING days, and the selection consumer
  *    ([[graft.operators.Sampling.mixPlanWith]]) computed from B's
  *    maintained table ≡ the plan recomputed from the survivors.
  *
  * {{{
  * PACK_DIR=target/testdata/sf10z sbt 'runMain graft.tools.MultiStoreSoak'
  * }}}
  */
object MultiStoreSoak {

  private final class Killed extends RuntimeException("injected kill")

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
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val days = (0 to 6).map(d => docs.where(col("doc_id") % 7 === d))
    println(s"[multi-store] dir=$dir docs=${docs.count()} days=7")

    val storeA = java.nio.file.Files.createTempDirectory("graft-msA").toString
    val storeB = java.nio.file.Files.createTempDirectory("graft-msB").toString
    val keysA = Seq("token"); val countsA = Seq("n")
    val keysB = Seq("source")
    val countsB = Seq("n_docs", "n_tokens", "char_mass")

    def tallyOf(df: DataFrame): DataFrame =
      CorpusStats.sourceTallies(df, "source", "text", "n_chars")
    def foldA(d: Int): Boolean =
      StatsMaintenance.foldBatch(days(d), d.toLong, storeA, keysA, countsA,
        CorpusStats.tokenCounts(_, "text"))
    def foldB(d: Int): Boolean =
      StatsMaintenance.foldBatch(days(d), d.toLong, storeB, keysB, countsB,
        tallyOf)

    /** (sorted committed version names, watermark) — the isolation
      * fingerprint: any cross-store effect would move one of these.
      */
    def snapshot(path: String): (Seq[String], Option[Long]) = {
      val names = Option(new java.io.File(path).listFiles())
        .map(_.map(_.getName).sorted.toSeq).getOrElse(Seq.empty)
      (names, StatsMaintenance.lastFolded(spark, path))
    }
    def killAt(point: String)(op: => Unit): Unit = {
      StatsMaintenance.testCrashPoint =
        p => if (p == point) throw new Killed
      val killed =
        try { op; false }
        catch { case _: Killed => true }
        finally StatsMaintenance.testCrashPoint = _ => ()
      require(killed, s"kill at $point never fired")
    }
    def tableEq(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    // interleaved schedules: A leads, B lags two days
    require(foldA(0)); require(foldA(1)); require(foldB(0))
    require(foldA(2)); require(foldB(1))

    // kill A's day-3 fold at post-parquet; B must be untouched
    val bBefore = snapshot(storeB)
    killAt("post-parquet") { foldA(3): Unit }
    require(snapshot(storeB) == bBefore,
      "A's kill leaked into B's store (versions or watermark moved)")
    require(StatsMaintenance.lastFolded(spark, storeA).contains(2L),
      "killed fold must not advance A's watermark")
    require(foldA(3), "redelivered A day-3 fold must land")
    println("[multi-store] kill A@post-parquet: B untouched, A recovered " +
      "on redelivery .. PASS")

    // kill B's day-2 fold at marker-open; A must be untouched
    val aBefore = snapshot(storeA)
    killAt("marker-open") { foldB(2): Unit }
    require(snapshot(storeA) == aBefore,
      "B's kill leaked into A's store (versions or watermark moved)")
    require(StatsMaintenance.lastFolded(spark, storeB).contains(1L),
      "killed fold must not advance B's watermark")
    require(foldB(2), "redelivered B day-2 fold must land")
    println("[multi-store] kill B@marker-open: A untouched, B recovered " +
      "on redelivery .. PASS")

    require(foldA(4)); require(foldB(3))

    // day 4 maintenance: retract B's day-1 tallies; A must be untouched
    val aBeforeRetract = snapshot(storeA)
    StatsMaintenance.retractBatch(spark, storeB, tallyOf(days(1)),
      keysB, countsB)
    require(snapshot(storeA) == aBeforeRetract,
      "B's retraction leaked into A's store")
    require(StatsMaintenance.lastFolded(spark, storeB).contains(3L),
      "retraction must not move B's watermark")
    println("[multi-store] retract B day-1: A untouched, B watermark " +
      "stable .. PASS")

    require(foldA(5)); require(foldB(4)); require(foldA(6))
    require(foldB(5)); require(foldB(6))

    // replays skip per store, independently
    require(!foldA(4) && !foldB(2), "replays must skip per-store")

    // end state: each store equals ITS OWN recompute
    val aGot = StatsMaintenance.readStats(spark, storeA).get
    val aWant = CorpusStats.tokenCounts(docs, "text")
    require(tableEq(aGot, aWant),
      "store A drifted from the all-days token-count recompute")
    val survivors = docs.where(col("doc_id") % 7 =!= 1)
    val bGot = StatsMaintenance.readStats(spark, storeB).get
    val bWant = tallyOf(survivors)
    require(tableEq(bGot, bWant),
      "store B drifted from the surviving-days tally recompute")
    require(StatsMaintenance.lastFolded(spark, storeA).contains(6L))
    require(StatsMaintenance.lastFolded(spark, storeB).contains(6L))
    println("[multi-store] A == all-days recompute (exact token counts), " +
      "B == surviving-days recompute (tallies) .. PASS")

    // the selection consumer off B's maintained table alone
    val planGot = Sampling.mixPlanWith(bGot).orderBy("source")
      .collect().toSeq
    val planWant = Sampling.mixPlanWith(bWant).orderBy("source")
      .collect().toSeq
    require(planGot == planWant,
      "mix plan from the maintained tallies drifted from recompute")
    require(planGot.nonEmpty)
    println(s"[multi-store] mix plan from maintained tallies == recompute " +
      s"(${planGot.size} sources) .. PASS")

    println("[multi-store] ALL PASS")
    spark.stop()
  }
}
