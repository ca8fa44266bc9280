package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
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
  * readers still prune directories; readers use [[read]] which drops
  * the internal `batch` column. Batch dirs inside a day accumulate
  * small files — compact with [[compactDay]] (NOT
  * `PartitionedLake.compactDay`, which writes the single-level layout
  * and would corrupt partition discovery here) on a maintenance
  * cadence.
  */
object LakeIngest {

  /** The reserved batch id compaction rewrites a day into. */
  val CompactedBatchId: Long = -1L

  /** Idempotent write of one micro-batch (exposed for testing and for
    * batch backfills that want the same replay safety).
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long,
      tsCol: String = "ts"): Unit =
    graft.sources.PartitionedLake.overwritePartitions(
      batch.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
        .withColumn("batch", lit(batchId)),
      path, Seq("dt", "batch"))

  /** Compact one ingested day: merge all its `batch=` partitions into
    * the reserved `batch=-1` partition (`nFiles` files), then remove
    * the superseded batch directories. Preserves the two-level layout,
    * so readers and day pruning are unaffected.
    *
    * Ordering caveat (standard lakehouse compaction rule): only
    * compact days whose batches the streaming checkpoint has fully
    * committed — a replay of a batch id that was already folded into
    * `batch=-1` would re-add its rows as a fresh `batch=` partition.
    */
  def compactDay(spark: org.apache.spark.sql.SparkSession, path: String,
      day: String, nFiles: Int = 1): Unit = {
    require(nFiles > 0)
    val part = spark.read.parquet(path).where(col("dt") === day)
    graft.sources.PartitionedLake.overwritePartitions(
      part.withColumn("batch", lit(CompactedBatchId)).repartition(nFiles),
      path, Seq("dt", "batch"))
    // dynamic overwrite only replaced (day, -1); drop the folded batches
    val dayDir = new org.apache.hadoop.fs.Path(s"$path/dt=$day")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dayDir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch=") && name != s"batch=$CompactedBatchId")
        fs.delete(st.getPath, true)
    }
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

  /** Read the ingested lake without the internal batch column. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")
}
