package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end soak of the streaming lake ingest under a live
  * compaction cadence:
  *
  * {{{
  * sbt 'runMain graft.tools.IngestSoak 45'
  * }}}
  *
  * One Structured Streaming query ingests a rate source through
  * [[graft.streaming.LakeIngest.start]] (each value becomes an event
  * on one of three days, so every micro-batch touches several dt
  * partitions), while the MAIN thread runs
  * [[graft.streaming.LakeIngest.compactDay]] against all three days in
  * a tight loop with the query's own checkpoint as the fold ceiling —
  * compacting days the stream is actively writing, the interleaving
  * the unit tests can only replay piecewise.
  *
  * Invariants checked BETWEEN compaction rounds (reads concurrent with
  * the stream, serialized with the swap — the one window where a
  * reader may transiently see a mid-swap day):
  *  1. no duplicates, ever: `count == countDistinct(event_id)` — the
  *     no-double-count guarantee under real timing;
  *  2. monotone growth: the visible row count never decreases;
  * and at the end, after a final quiesced compaction:
  *  3. no loss: exactly the ids 0..max survive, each once;
  *  4. every day is folded flat to its single `batch=-1` partition.
  *
  * Prints one JSON line; exits non-zero on any violation.
  */
object IngestSoak {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(45)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.minBatchesToRetain", 5)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.LakeIngest

    val lake = Files.createTempDirectory("graft-ingest-soak").toString
    val ckpt = Files.createTempDirectory("graft-ingest-soak-ckpt").toString
    val days = Seq("2024-06-01", "2024-06-02", "2024-06-03")

    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", 2000).load()
      .select(col("value").as("event_id"),
        expr("timestampadd(DAY, CAST(value % 3 AS INT), " +
          "TIMESTAMP'2024-06-01 00:00:00')").as("ts"),
        (col("value") % 97).as("payload"))
    val query = LakeIngest.start(events, lake, ckpt)

    // wait for the first committed NON-EMPTY micro-batch — an empty
    // lake has no schema to read (a rate stream's batch 0 often carries
    // zero rows and writes no partitions), and a soak that never
    // ingested proves nothing
    def hasData = Option(new java.io.File(lake).listFiles())
      .getOrElse(Array.empty).exists(_.getName.startsWith("dt="))
    val warmup = System.currentTimeMillis() + 60000L
    while (!(hasData &&
        LakeIngest.committedBatchHighWater(spark, ckpt).nonEmpty) &&
      System.currentTimeMillis() < warmup) Thread.sleep(100)
    require(hasData, "stream landed no data within 60s")

    var compactions = 0
    var dupViolations = 0
    var shrinkViolations = 0
    var lastCount = 0L
    val deadline = System.currentTimeMillis() + seconds * 1000L
    while (System.currentTimeMillis() < deadline) {
      days.foreach { d =>
        LakeIngest.compactDay(spark, lake, d, nFiles = 2,
          checkpointDir = Some(ckpt))
      }
      compactions += days.length
      val snap = LakeIngest.read(spark, lake)
        .agg(count(lit(1)), countDistinct(col("event_id"))).collect()(0)
      val (n, nd) = (snap.getLong(0), snap.getLong(1))
      if (n != nd) dupViolations += 1
      if (n < lastCount) shrinkViolations += 1
      lastCount = n
    }
    query.stop()
    query.awaitTermination()

    // quiesced: fold everything (no active writer, no ceiling needed)
    days.foreach(d => LakeIngest.compactDay(spark, lake, d, nFiles = 2))
    val fin = LakeIngest.read(spark, lake)
      .agg(count(lit(1)), countDistinct(col("event_id")),
        max(col("event_id"))).collect()(0)
    val (n, nd, mx) = (fin.getLong(0), fin.getLong(1), fin.getLong(2))
    val lost = if (n == mx + 1) 0L else mx + 1 - n
    val unfolded = days.map { d =>
      Option(new java.io.File(s"$lake/dt=$d").listFiles()).getOrElse(Array.empty)
        .map(_.getName).count(nm => nm.startsWith("batch=") && nm != "batch=-1")
    }.sum

    val violations = dupViolations + shrinkViolations + unfolded +
      (if (n != nd) 1 else 0) + (if (lost != 0) 1 else 0)
    println(s"""{"seconds":$seconds,"rows":$n,"distinct":$nd,"max_id":$mx,"lost":$lost,"compactions":$compactions,"dup_violations":$dupViolations,"shrink_violations":$shrinkViolations,"unfolded_batch_dirs":$unfolded,"violations":$violations}""")
    scala.reflect.io.Directory(new java.io.File(lake)).deleteRecursively()
    scala.reflect.io.Directory(new java.io.File(ckpt)).deleteRecursively()
    spark.stop()
    if (violations != 0) sys.exit(1)
  }
}
