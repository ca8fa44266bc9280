package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats
import graft.streaming.StatsMaintenance

/** Crash/replay soak for the maintained-stats store: hundreds of
  * micro-batch folds over the 500k-doc Zipf decade with kills injected
  * at RANDOM REAL code-path points inside publish (post-reserve,
  * post-parquet, mid-marker — the torn-marker window that once bricked
  * the store — and post-marker/pre-prune), plus periodic offline
  * retractions, some of which are also killed mid-publish. After every
  * kill the batch is re-delivered exactly as Structured Streaming
  * would (its offsets were never committed); a kill AFTER the marker
  * content landed must instead be absorbed as a replay skip. The run
  * ends by comparing the maintained table against a from-scratch
  * recompute of the surviving batches — exact set equality, not a
  * checksum.
  *
  * {{{
  * STATS_SOAK_DIR=target/testdata/sf10z STATS_SOAK_BATCHES=250 \
  *   STATS_SOAK_CRASH_P=0.3 sbt 'runMain graft.tools.StatsSoak'
  * }}}
  *
  * Retraction retry policy mirrors a real operator: the soak retries a
  * killed retraction only when the store shows no new committed
  * version (torn kill); a kill after the commit landed is visible as
  * version growth without watermark movement, so the operator does NOT
  * retry (retraction is deliberately non-idempotent — the
  * negative-count guard makes a wrong retry loud, not silent).
  */
object StatsSoak {

  private final class SimulatedKill(val at: String)
    extends RuntimeException(s"injected kill at $at")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("STATS_SOAK_DIR", "target/testdata/sf10z")
    val nBatches = sys.env.getOrElse("STATS_SOAK_BATCHES", "250").toInt
    val crashP = sys.env.getOrElse("STATS_SOAK_CRASH_P", "0.3").toDouble
    val seed = sys.env.getOrElse("STATS_SOAK_SEED", "13").toLong
    val store = java.nio.file.Files
      .createTempDirectory("graft-stats-soak").toString
    val rnd = new scala.util.Random(seed)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    println(s"[stats-soak] dir=$dir docs=$nDocs batches=$nBatches " +
      s"crashP=$crashP seed=$seed store=$store")

    def batchDocs(id: Long): DataFrame =
      docs.where(pmod(col("doc_id"), lit(nBatches.toLong)) === id)
    def partialOf(b: DataFrame): DataFrame =
      CorpusStats.lineDf(b, "doc_id", "text")
    val keys = Seq("line_key")
    val counts = Seq("line_df")

    val killPointsFold =
      Seq("post-reserve", "post-parquet", "marker-open", "post-marker")
    val killPointsRetract =
      Seq("post-reserve", "post-parquet", "marker-open")
    var kills = Map.empty[String, Int].withDefaultValue(0)
    var redeliverFolded = 0
    var redeliverSkipped = 0
    var retractions = 0
    val retracted = scala.collection.mutable.Set.empty[Long]
    var folded = 0L

    def armedKill(point: String): Unit = {
      var armed = true
      StatsMaintenance.testCrashPoint = p =>
        if (armed && p == point) { armed = false; throw new SimulatedKill(p) }
    }
    def disarm(): Unit = StatsMaintenance.testCrashPoint = _ => ()

    val t0 = System.nanoTime()
    (0L until nBatches.toLong).foreach { id =>
      val b = batchDocs(id)
      val crashAt = if (rnd.nextDouble() < crashP)
        Some(killPointsFold(rnd.nextInt(killPointsFold.size))) else None
      crashAt match {
        case None =>
          require(StatsMaintenance.foldBatch(b, id, store, keys, counts,
            partialOf), s"clean fold of batch $id unexpectedly skipped")
        case Some(point) =>
          armedKill(point)
          try {
            StatsMaintenance.foldBatch(b, id, store, keys, counts, partialOf)
            throw new IllegalStateException(s"kill at $point did not fire")
          } catch {
            case k: SimulatedKill => kills += k.at -> (kills(k.at) + 1)
          } finally disarm()
          // the engine re-delivers the batch (offsets never committed)
          val refolded = StatsMaintenance.foldBatch(b, id, store, keys,
            counts, partialOf)
          if (point == "post-marker") {
            require(!refolded,
              s"batch $id re-delivered after a committed fold was " +
                "double-counted")
            redeliverSkipped += 1
          } else {
            require(refolded,
              s"batch $id re-delivery after a torn kill at $point was " +
                "wrongly skipped")
            redeliverFolded += 1
          }
      }
      folded += 1
      // periodic OFFLINE maintenance: retract a random constituent day
      if (id >= 10 && id % 40 == 17) {
        val candidates = (0L to id).filterNot(retracted.contains)
        val victim = candidates(rnd.nextInt(candidates.size))
        val partial = partialOf(batchDocs(victim))
        val crash = if (rnd.nextDouble() < crashP)
          Some(killPointsRetract(rnd.nextInt(killPointsRetract.size)))
        else None
        crash match {
          case None =>
            StatsMaintenance.retractBatch(spark, store, partial, keys, counts)
          case Some(point) =>
            armedKill(point)
            try {
              StatsMaintenance.retractBatch(spark, store, partial, keys,
                counts)
              throw new IllegalStateException(s"kill at $point did not fire")
            } catch {
              case k: SimulatedKill => kills += k.at -> (kills(k.at) + 1)
            } finally disarm()
            // torn kill: no new committed version — the operator retries
            StatsMaintenance.retractBatch(spark, store, partial, keys, counts)
        }
        retracted += victim
        retractions += 1
        val wm = StatsMaintenance.lastFolded(spark, store)
        require(wm.contains(id),
          s"retraction moved the watermark: $wm after batch $id")
      }
      if ((id + 1) % 50 == 0) {
        val rows = StatsMaintenance.readStats(spark, store).get.count()
        println(f"[stats-soak] ${id + 1}/$nBatches folds, " +
          f"${kills.values.sum} kills, $retractions retractions, " +
          f"table $rows rows, ${(System.nanoTime() - t0) / 1e9}%.0fs")
      }
    }
    val foldWall = (System.nanoTime() - t0) / 1e9

    // final adjudication: maintained == from-scratch recompute of the
    // surviving batches, as exact set equality
    val surviving = docs.where(!pmod(col("doc_id"), lit(nBatches.toLong))
      .isin(retracted.toSeq: _*))
    val recompute = partialOf(surviving)
    val maintained = StatsMaintenance.readStats(spark, store).get
    val onlyM = maintained.except(recompute).count()
    val onlyR = recompute.except(maintained).count()
    val rows = maintained.count()
    println(f"[stats-soak] $nBatches batches folded in $foldWall%.0fs " +
      f"(${foldWall / nBatches}%.2fs/fold), kills=${kills.toSeq.sorted} " +
      f"(${kills.values.sum} total), redelivery folded=$redeliverFolded " +
      f"skipped=$redeliverSkipped, retractions=$retractions " +
      s"(${retracted.toSeq.sorted.mkString(",")})")
    println(s"[stats-soak] maintained rows=$rows, " +
      s"maintained-minus-recompute=$onlyM, recompute-minus-maintained=$onlyR")
    require(onlyM == 0 && onlyR == 0,
      "maintained table drifted from the recompute")
    require(StatsMaintenance.lastFolded(spark, store)
      .contains(nBatches - 1L), "final watermark wrong")
    val leftover = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("v=")).toSeq
    require(leftover.size == 1, s"store not pruned to retain=1: $leftover")
    println("[stats-soak] PASS: maintained == recompute after " +
      s"${kills.values.sum} kills at ${kills.keySet.mkString("/")}")
    spark.stop()
  }
}
