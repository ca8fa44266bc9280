package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.CorpusStats

/** Replay-safe, crash-safe persistence for the incrementally maintained
  * corpus-statistics tables (line-df, token-df, bigram-LM counts, the
  * DSIR feature model — any additive (keys, counts) shape).
  *
  * THE HAZARD THIS CLOSES: a bare `foreachBatch` maintenance loop that
  * folds every delivered micro-batch into the stats table is WRONG
  * under Structured Streaming's at-least-once contract — after a
  * crash/restart the engine re-delivers the last uncommitted batch, a
  * naive fold counts it twice, and additive merges have no way to
  * notice (the negative-count guard in
  * [[graft.operators.CorpusStats.retractStats]] catches deflation, not
  * inflation). The fix is the reference's own watermark pattern
  * (`/root/reference/internal/services/tasks/tasks.go:155-169`: record
  * progress WITH the write, absorb replays by idempotence), applied to
  * the stats store:
  *
  *  - the last-folded micro-batch id (the WATERMARK) is persisted
  *    INSIDE the commit marker of every published table version, so
  *    table and watermark commit atomically and can never drift apart;
  *  - a delivered batch with id ≤ the watermark is a replay and is
  *    SKIPPED — the fold is idempotent per batch id;
  *  - each fold publishes a complete new table version and only then
  *    retires the old one, so readers always see exactly one fully
  *    committed table.
  *
  * ATOMIC PUBLISH, rename-free: a write goes to its own fresh
  * directory `v=<n>` (n = a monotonic VERSION counter, independent of
  * batch ids) and then creates a commit marker file inside it (leading
  * underscore — invisible to Spark's parquet reader) carrying the
  * watermark. "Current table" is THE HIGHEST-n DIRECTORY THAT HAS A
  * MARKER. A crash mid-write leaves a marker-less (torn) directory
  * that readers ignore and the next write overwrites; a crash after
  * the marker but before old-version cleanup leaves two committed
  * versions, of which readers use the newer and the next write prunes
  * the older. This is the same commit discipline as
  * [[LakeIngest.compactDay]]'s staging-swap, with the version-counter
  * namespace replacing the rename — deliberate: directory renames are
  * not atomic on object stores, while "create a marker file, pick the
  * max committed version" is correct on any store with atomic
  * single-file creation.
  *
  * The version counter is SEPARATE from the batch watermark so that
  * OFFLINE maintenance — [[retractBatch]] deleting a day
  * ([[graft.operators.CorpusStats.retractStats]]), or any future
  * rewrite/compaction — can publish new versions without advancing the
  * watermark: a retraction must never cause a genuinely new micro-batch
  * to be skipped as a replay.
  *
  * Works for all four maintained shapes through one code path (the
  * generic [[graft.operators.CorpusStats.mergeStats]]):
  * {{{
  * // line-df:    keys = Seq("line_key"),  counts = Seq("line_df")
  * // token-df:   keys = Seq("token"),     counts = Seq("token_df")
  * // bigram-LM:  keys = Seq("w1", "bg"),  counts = Seq("n")
  * // DSIR model: keys = Seq("bucket"),    counts = Seq("tgt_n", "raw_n")
  * StatsMaintenance.start(stream, path, Seq("line_key"), Seq("line_df"),
  *   b => CorpusStats.lineDf(b, "doc_id", "text"), checkpointDir)
  * }}}
  *
  * EXACTNESS: each committed fold is exact under the same precondition
  * as the additive merges — the micro-batches partition the document
  * space (Structured Streaming delivers each input row in exactly one
  * batch id, so with the replay skip the precondition holds by
  * construction). Scale shape per fold: one partial over the BATCH
  * (O(day)), one union+sum against the Heaps-law-sized stats table, one
  * table-sized write — the corpus is never rescanned (measured 3.5-4.7x
  * cheaper than recompute at a 10:1 history:day ratio,
  * `bench_evidence/r11_incremental_stats_probe.txt`; the gap scales
  * with the ratio).
  */
object StatsMaintenance {

  /** Commit marker created inside a version directory AFTER its
    * parquet write completes; its presence defines "committed" and its
    * content is the batch watermark at publish time. Our own file
    * rather than Spark's `_SUCCESS`, which can be disabled by
    * committer configuration.
    */
  val Marker = "_GRAFT_COMMITTED"

  private val VersionPrefix = "v="

  private def fileSystem(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, dir, committed watermark) for committed versions;
    * watermark None for torn ones.
    */
  private def versions(spark: SparkSession, path: String)
      : Seq[(Long, Path, Option[Long])] = {
    val root = new Path(path)
    val fs = fileSystem(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap(p => p.getName.stripPrefix(VersionPrefix).toLongOption
        .filter(_ => p.getName.startsWith(VersionPrefix))
        .map(n => (n, p)))
      .map { case (n, p) =>
        val m = new Path(p, Marker)
        val wm = if (!fs.exists(m)) None
        else {
          val in = fs.open(m)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim.toLong)
          finally in.close()
        }
        (n, p, wm)
      }
  }

  private def current(spark: SparkSession, path: String)
      : Option[(Long, Path, Long)] =
    versions(spark, path).collect { case (n, p, Some(wm)) => (n, p, wm) }
      .sortBy(_._1).lastOption

  /** The persisted watermark: the highest micro-batch id whose fold is
    * fully committed, or None for an empty store. A batch with id ≤
    * this has already been absorbed — re-delivery must be skipped.
    */
  def lastFolded(spark: SparkSession, path: String): Option[Long] =
    current(spark, path).map(_._3).filter(_ >= 0)

  /** The current maintained table — the highest COMMITTED version; a
    * torn directory from a crashed write is never visible here. None
    * if nothing has been committed yet.
    */
  def readStats(spark: SparkSession, path: String): Option[DataFrame] =
    current(spark, path).map { case (_, p, _) =>
      spark.read.parquet(p.toString) }

  /** Publish `table` as the next committed version carrying
    * `watermark`, then prune older versions and torn debris. Commit
    * order: parquet write to the fresh dir → marker (THE commit
    * point — table and watermark become visible together) → prune; a
    * crash before the prune only defers cleanup to the next publish.
    *
    * `retain` committed versions survive the prune (counting the one
    * just published): retain = 1 keeps only the new table; a larger
    * value is the concurrent-reader lever — a scoring job that opened
    * version N stays valid while folds publish N+1..N+retain-1, the
    * same grace window a lakehouse table's retention gives. Torn
    * directories are always deleted.
    */
  private def publish(spark: SparkSession, path: String, table: DataFrame,
      watermark: Long, retain: Int): Unit = {
    require(retain >= 1, s"retain=$retain")
    val fs = fileSystem(spark, path)
    val existing = versions(spark, path)
    val next = existing.map(_._1).maxOption.getOrElse(-1L) + 1L
    val versionDir = new Path(path, s"$VersionPrefix$next")
    table.write.mode("overwrite").parquet(versionDir.toString)
    val out = fs.create(new Path(versionDir, Marker), true)
    try out.write(watermark.toString.getBytes("UTF-8")) finally out.close()
    val keep = (existing.collect { case (n, _, Some(_)) => n }
      :+ next).sorted.takeRight(retain).toSet
    existing.foreach { case (n, p, wm) =>
      val torn = wm.isEmpty
      if (torn || !keep.contains(n))
        require(fs.delete(p, true),
          s"delete of superseded stats version $p failed - leaving it " +
            "cannot double-count (readers take the max committed version) " +
            "but the store would grow without bound")
    }
  }

  /** Fold one delivered micro-batch into the maintained store.
    * Idempotent per batch id: a replay (id ≤ the persisted watermark)
    * returns false and leaves the store untouched — this is what makes
    * the loop safe under foreachBatch's at-least-once delivery.
    *
    * @param partialOf batch → aggregated partial with exactly the
    *                  (keys ++ counts) columns (e.g.
    *                  `CorpusStats.lineDf(_, "doc_id", "text")`)
    * @param retain committed versions kept after the publish (≥ 1, the
    *               concurrent-reader grace window — see `publish`)
    * @return true if the batch was folded, false if skipped as a replay
    */
  def foldBatch(batch: DataFrame, batchId: Long, path: String,
      keys: Seq[String], counts: Seq[String],
      partialOf: DataFrame => DataFrame, retain: Int = 1): Boolean = {
    require(batchId >= 0, s"negative batchId: $batchId")
    val spark = batch.sparkSession
    if (lastFolded(spark, path).exists(batchId <= _)) return false
    val partial = partialOf(batch)
    val merged = readStats(spark, path) match {
      case Some(cur) => CorpusStats.mergeStats(Seq(cur, partial), keys, counts)
      case None =>
        partial.select(
          (keys ++ counts).map(org.apache.spark.sql.functions.col): _*)
    }
    publish(spark, path, merged, batchId, retain)
    true
  }

  /** OFFLINE deletion maintenance: subtract a constituent batch's
    * recomputed partial from the maintained table
    * ([[graft.operators.CorpusStats.retractStats]] — emptied keys
    * vanish, a non-constituent partial fails loudly on negative
    * counts) and publish the result as a new committed version WITHOUT
    * advancing the batch watermark — deleting yesterday's data must
    * never cause tomorrow's genuinely new micro-batch to be skipped as
    * a replay. Same crash safety as a fold (torn writes invisible,
    * prune deferred at worst).
    */
  def retractBatch(spark: SparkSession, path: String, partial: DataFrame,
      keys: Seq[String], counts: Seq[String], retain: Int = 1): Unit = {
    val cur = current(spark, path).getOrElse(
      throw new IllegalStateException(
        s"retractBatch: no committed stats table at $path"))
    val table = spark.read.parquet(cur._2.toString)
    publish(spark, path,
      CorpusStats.retractStats(table, partial, keys, counts), cur._3,
      retain)
  }

  /** Start the maintenance loop: every delivered micro-batch is folded
    * through [[foldBatch]], so restarts and re-deliveries are absorbed
    * by the persisted watermark instead of double-counting the table.
    * Score against the maintained table with the `*With` operators
    * (e.g. [[graft.operators.CorpusStats.dropDuplicateLinesWith]]) on
    * [[readStats]]'s result.
    */
  def start(stream: DataFrame, path: String, keys: Seq[String],
      counts: Seq[String], partialOf: DataFrame => DataFrame,
      checkpointDir: String, retain: Int = 1): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, path, keys, counts, partialOf,
          retain): Unit
      }
      .start()
}
