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
  * small files — compact with
  * [[graft.sources.PartitionedLake.compactDay]] on a maintenance
  * cadence.
  */
object LakeIngest {

  /** Idempotent write of one micro-batch (exposed for testing and for
    * batch backfills that want the same replay safety).
    */
  def writeBatch(batch: DataFrame, path: String, batchId: Long,
      tsCol: String = "ts"): Unit =
    batch.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("batch", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt", "batch")
      .parquet(path)

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
