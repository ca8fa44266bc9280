package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Date-partitioned lake layout for the event stream.
  *
  * At 100 TB the events table is not one parquet file but a
  * `dt=YYYY-MM-DD/` partitioned lake, and a backfill over a day range
  * (SURVEY §2 S2, reference tasks.go:79-127) must scan ONLY that
  * range's partitions — Catalyst partition pruning, visible in the
  * plan as `PartitionFilters` — never the whole table. The driver's
  * test data ships as flat parquet, so [[eventsByDay]] materializes a
  * partitioned copy once per source dir (write-once, content-keyed
  * cache under the JVM temp dir; the read-only testdata dir is never
  * touched) and all partitioned-lake queries read that.
  *
  * The partition column `dt` is the UTC event day rendered as a
  * string — the layout every date-partitioned warehouse uses, and the
  * one DuckDB/Spark agree on byte-for-byte (no timezone or epoch-unit
  * ambiguity in the partition values).
  */
object PartitionedLake {

  /** Size+mtime fingerprint of the source file or directory — cheap
    * change detection so a regenerated events.parquet invalidates the
    * cached partitioned copy instead of silently serving stale data.
    */
  private def fingerprint(f: File): String =
    if (f.isDirectory) {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[File])
      s"d${kids.map(_.length()).sum}m${kids.map(_.lastModified()).maxOption.getOrElse(0L)}"
    } else s"f${f.length()}m${f.lastModified()}"

  /** Deterministic location of the partitioned copy of
    * `$sfDir/events.parquet` — keyed by path AND source fingerprint,
    * so repeated verify/bench runs in one container reuse the first
    * write while a regenerated source gets a fresh copy.
    */
  def eventsPath(sfDir: String): String = {
    val stamp = s"$sfDir|${fingerprint(new File(s"$sfDir/events.parquet"))}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(stamp.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    new File(sys.props("java.io.tmpdir"), s"graft-lake-events-$key").getPath
  }

  /** Idempotent per-day overwrite — the at-scale backfill WRITE path.
    * Dynamic partition overwrite replaces exactly the `dt=` partitions
    * present in `df` and leaves every other day untouched, so
    * re-running a day's backfill (the reference's day-by-day catch-up,
    * tasks.go:79-127) is a safe replace, never an append-duplicate.
    * Rows are sorted within partitions by `sortCols` so per-file
    * parquet min/max stats enable row-group skipping on those columns.
    */
  def overwriteDays(df: DataFrame, path: String,
      sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(("dt" +: sortCols).map(col): _*)
    sorted.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .parquet(path)
  }

  /** Compact one day's partition to `nFiles` files — the small-files
    * maintenance pass every streaming-ingested lake needs (a day
    * written by N executors × M micro-batches accumulates N×M small
    * parquet files; scans then pay per-file open cost). Reads only the
    * target partition (pruned), repartitions, and dynamically
    * overwrites just that day.
    */
  def compactDay(spark: SparkSession, path: String, day: String,
      nFiles: Int = 1, sortCols: Seq[String] = Nil): Unit = {
    require(nFiles > 0)
    val part = spark.read.parquet(path).where(col("dt") === day)
    overwriteDays(part.repartition(nFiles), path, sortCols)
  }

  /** The events table as a `dt`-partitioned lake, materializing the
    * partitioned copy on first use (skipped when `_SUCCESS` exists).
    * Guarded by a cross-process file lock — `this.synchronized` only
    * serializes one JVM, but Verify and Bench may run as separate JVMs
    * against the same temp path; an unguarded double-write would
    * corrupt the copy.
    */
  def eventsByDay(spark: SparkSession, sfDir: String): DataFrame = {
    val path = eventsPath(sfDir)
    this.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(s"$path.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          if (!new File(path, "_SUCCESS").exists()) {
            Tables.events(spark, sfDir)
              .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
              .write.mode(SaveMode.Overwrite)
              .partitionBy("dt")
              .parquet(path)
          }
        } finally lock.release()
      } finally ch.close()
    }
    spark.read.parquet(path)
  }
}
