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

  /** Manifest file written inside the staging partition listing the
    * exact `batch=` directory names the staged fold consumed. The
    * cleanup pass (including a crash resume) deletes precisely this
    * set — never an inferred one — so a batch directory that lands
    * between the fold's listing and the commit marker can never be
    * deleted unfolded. Leading underscore keeps it invisible to
    * Spark's file readers after the staging→`batch=-1` rename.
    */
  val FoldedManifest: String = "_FOLDED"

  /** Highest micro-batch id the Structured Streaming checkpoint has
    * COMMITTED (sink writes durable, offsets sealed), or None if the
    * checkpoint has no commit log yet. Commit-log entries are files
    * named by batch id under `commits/` — public on-disk contract of
    * Spark's HDFSMetadataLog. Compaction uses this as the fold
    * ceiling: a batch the checkpoint might still replay is never
    * folded away, so the replay lands back in its own `batch=` dir
    * (idempotent overwrite) instead of duplicating rows already
    * merged into `batch=-1`.
    */
  def committedBatchHighWater(spark: SparkSession,
      checkpointDir: String): Option[Long] = {
    val commits = new Path(checkpointDir, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) None
    else fs.listStatus(commits).map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).maxOption
  }

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
    * Ordering rule (standard lakehouse compaction rule), ENFORCED when
    * `checkpointDir` is given: only batches the streaming checkpoint
    * has committed are folded — an uncommitted batch id the engine
    * might still replay keeps its own `batch=` dir, where the replay's
    * dynamic overwrite is idempotent. Without a checkpoint the caller
    * owns the rule (normal cadence: compact yesterday and older, no
    * active writer on the day).
    *
    * Every `rename`/`delete` return value is checked: Hadoop
    * filesystems report most failures by returning false, and a
    * silently failed rename would leave the day's only copy parked in
    * the hidden staging partition — invisible to [[read]] with no
    * error anywhere.
    */
  def compactDay(spark: SparkSession, path: String, day: String,
      nFiles: Int = 1, checkpointDir: Option[String] = None): Unit = {
    require(nFiles > 0)
    val dayDir = new Path(s"$path/dt=$day")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dayDir)) return
    val staging = new Path(dayDir, s"batch=$StagingBatchId")
    val commitMarker = new Path(staging, "_SUCCESS")
    val manifest = new Path(staging, FoldedManifest)

    if (fs.exists(staging) && !fs.exists(commitMarker))
      require(fs.delete(staging, true), // torn write from a crashed run
        s"could not discard torn staging for dt=$day")

    // A COMMITTED staging with no manifest predates the manifest
    // protocol (current code writes _FOLDED before _SUCCESS, so it can
    // never produce this state). Its input provenance is unknown:
    // finishing the swap can't know which batch dirs to delete (double
    // count), and deleting it may destroy the only copy of rows whose
    // inputs the legacy cleanup already removed. Quarantine it under a
    // hidden name instead — invisible to [[read]] and to the fold
    // listing — so compaction unwedges, nothing double-counts, and an
    // operator can reconcile the quarantined copy offline.
    if (fs.exists(staging) && !fs.exists(manifest)) {
      val quarantine = Iterator.from(0)
        .map(i => new Path(dayDir, s"_orphan_staging_$i"))
        .find(p => !fs.exists(p)).get
      require(fs.rename(staging, quarantine),
        s"quarantine rename of manifest-less staging failed for dt=$day")
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dt=$day: committed staging had no $FoldedManifest manifest " +
          s"(pre-manifest writer); quarantined to $quarantine and refolding")
    }

    if (!fs.exists(staging)) {
      val foldCeiling: Long => Boolean = checkpointDir match {
        case None => _ => true
        case Some(dir) =>
          val hwm = committedBatchHighWater(spark, dir).getOrElse(-1L)
          id => id == CompactedBatchId || id <= hwm
      }
      // capture the EXPLICIT input set now; the cleanup pass deletes
      // exactly these names, so anything listed here is in the fold
      // and anything not listed survives untouched
      val inputs = fs.listStatus(dayDir).map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .filterNot(_ == s"batch=$StagingBatchId")
        .filter(n => foldCeiling(n.stripPrefix("batch=").toLong))
        .sorted.toSeq
      if (inputs.isEmpty || inputs == Seq(s"batch=$CompactedBatchId")) return
      val ids = inputs.map(_.stripPrefix("batch=").toLong)
      // stage the merged day; reads only the captured inputs, writes
      // only (day, -2) — no partition is both read and overwritten
      val fold = spark.read.parquet(path)
        .where(col("dt") === day && col("batch").isin(ids: _*))
      graft.sources.PartitionedLake.overwritePartitions(
        fold.withColumn("batch", lit(StagingBatchId)).repartition(nFiles),
        path, Seq("dt", "batch"))
      val out = fs.create(manifest, true)
      try out.write(inputs.mkString("\n").getBytes("UTF-8")) finally out.close()
      fs.create(commitMarker, true).close() // commit marker
    }

    // staging is committed: delete exactly the manifest's folded set
    // (their rows are inside staging); dirs that landed after the
    // listing are absent from the manifest and must survive for the
    // next compaction round
    require(fs.exists(manifest),
      s"committed staging for dt=$day has no $FoldedManifest manifest")
    val in = fs.open(manifest)
    val folded =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).toList
      finally in.close()
    folded.foreach { name =>
      val p = new Path(dayDir, name)
      if (fs.exists(p)) require(fs.delete(p, true),
        s"delete of folded input $name failed for dt=$day — " +
          "leaving it would double-count on the next read")
    }
    // the folded set necessarily contained any previous batch=-1, so
    // the destination must be gone; renaming onto an existing dir
    // would nest staging INSIDE it and corrupt the two-level layout
    val dest = new Path(dayDir, s"batch=$CompactedBatchId")
    require(!fs.exists(dest),
      s"compaction destination $dest still exists before the swap")
    require(fs.rename(staging, dest),
      s"rename of staging to $dest failed for dt=$day — the day's " +
        "only copy is parked in the hidden staging partition")
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
