package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest into a date-partitioned parquet lake with
  * effectively-once file output.
  *
  * Plain `foreachBatch` + append is at-least-once: a micro-batch that
  * is retried after a sink failure appends its rows twice. Here every
  * batch writes under `dt=<day>/batch=<batchId>/` via DYNAMIC partition
  * overwrite, so a replayed batch id REPLACES its own partitions
  * instead of duplicating them — Structured Streaming's stable batch
  * ids plus overwrite-by-partition give idempotent retries with no
  * transaction log. (The same mechanism the checkpointed file sink
  * uses, expressed with plain parquet partitions; Spark's dynamic mode
  * only touches partitions present in the incoming frame, so prior
  * batches and sibling days are never rewritten.)
  *
  * Layout note: `dt` stays the FIRST partition level, so day-range
  * readers still prune directories; readers use [[read]], which hides
  * the internal `batch` column and any in-flight compaction staging.
  * Batch dirs inside a day accumulate small files — compact with
  * [[compactDay]] (NOT `PartitionedLake.compactDay`, which writes the
  * single-level layout and would corrupt partition discovery here) on
  * a maintenance cadence.
  */
object LakeIngest {

  /** The reserved batch id a compacted day lives under. */
  val CompactedBatchId: Long = -1L

  /** The reserved batch id compaction stages into before the swap —
    * invisible to [[read]], so a half-finished compaction can never
    * double-count a day.
    */
  val StagingBatchId: Long = -2L

  /** Idempotent write of one micro-batch (exposed for testing and for
    * batch backfills that want the same replay safety).
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long,
      tsCol: String = "ts"): Unit = {
    require(batchId >= 0, s"batch ids < 0 are reserved (got $batchId)")
    graft.sources.PartitionedLake.overwritePartitions(
      batch.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
        .withColumn("batch", lit(batchId)),
      path, Seq("dt", "batch"))
  }

  /** Compact one ingested day: merge its `batch=` partitions into the
    * reserved `batch=-1` partition (`nFiles` files) and remove the
    * superseded batch directories. Preserves the two-level layout, so
    * readers and day pruning are unaffected; a day with no partition
    * directory is a no-op.
    *
    * Crash-safe without a transaction log, via a hidden staging
    * partition: the merged day is first committed to `batch=-2` (which
    * [[read]] and the fold itself never see), then the input dirs are
    * deleted, then staging is renamed to `batch=-1`. Whatever the
    * crash point, readers never observe a double-counted day, and
    * re-running compactDay resumes: a torn staging write (no _SUCCESS)
    * is discarded; a committed staging is finished by deleting only
    * the dirs OLDER than it (batches that arrived after the crash
    * survive and fold next time) and completing the rename. The only
    * degraded window is a crash after the input deletes and before the
    * rename, which reads as a temporarily missing day until the next
    * compactDay call.
    *
    * Ordering caveat (standard lakehouse compaction rule): only
    * compact days whose batches the streaming checkpoint has fully
    * committed, and not while a writer is actively targeting the same
    * day (normal cadence: compact yesterday and older) — a replay of a
    * batch id that was already folded away would re-add its rows as a
    * fresh `batch=` partition.
    */
  def compactDay(spark: SparkSession, path: String, day: String,
      nFiles: Int = 1): Unit = {
    require(nFiles > 0)
    val dayDir = new Path(s"$path/dt=$day")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dayDir)) return
    val staging = new Path(dayDir, s"batch=$StagingBatchId")

    if (fs.exists(staging) && !fs.exists(new Path(staging, "_SUCCESS")))
      fs.delete(staging, true): Unit // torn write from a crashed run

    if (!fs.exists(staging)) {
      val inputs = fs.listStatus(dayDir)
        .filter(_.getPath.getName.startsWith("batch=")).toSeq
      if (inputs.isEmpty) return
      if (inputs.size == 1 &&
        inputs.head.getPath.getName == s"batch=$CompactedBatchId") return
      // stage the merged day; reads only batch != -2, writes only
      // (day, -2) — no partition is both read and overwritten
      val fold = spark.read.parquet(path)
        .where(col("dt") === day && col("batch") =!= StagingBatchId)
      graft.sources.PartitionedLake.overwritePartitions(
        fold.withColumn("batch", lit(StagingBatchId)).repartition(nFiles),
        path, Seq("dt", "batch"))
      fs.create(new Path(staging, "_SUCCESS"), true).close() // commit marker
    }

    // staging is committed: drop every batch dir older than it (their
    // rows are inside staging); dirs newer than staging arrived after
    // the stage and must survive for the next compaction round
    val cutoff = fs.getFileStatus(staging).getModificationTime
    fs.listStatus(dayDir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch=") && name != s"batch=$StagingBatchId" &&
        st.getModificationTime <= cutoff)
        fs.delete(st.getPath, true): Unit
    }
    fs.rename(staging, new Path(dayDir, s"batch=$CompactedBatchId")): Unit
  }

  /** Start the streaming ingest: events → dt-partitioned lake. */
  def start(events: DataFrame, path: String, checkpointDir: String,
      tsCol: String = "ts"): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, path, batchId, tsCol)
      }
      .start()

  /** Read the ingested lake without the internal batch column; an
    * in-flight compaction's staging partition is excluded, so readers
    * never see a day twice.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .where(col("batch") =!= StagingBatchId)
      .drop("batch")
}
