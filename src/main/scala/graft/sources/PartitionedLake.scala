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

  /** Deterministic location of the partitioned copy of
    * `$sfDir/events.parquet` — stable across sessions so repeated
    * verify/bench runs in one container reuse the first write.
    */
  def eventsPath(sfDir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
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
    */
  def eventsByDay(spark: SparkSession, sfDir: String): DataFrame = {
    val path = eventsPath(sfDir)
    this.synchronized {
      if (!new File(path, "_SUCCESS").exists()) {
        Tables.events(spark, sfDir)
          .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("dt")
          .parquet(path)
      }
    }
    spark.read.parquet(path)
  }
}
