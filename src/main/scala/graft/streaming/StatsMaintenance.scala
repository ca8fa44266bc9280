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
  *  - the last-folded micro-batch id is persisted WITH the table — the
  *    published version directory is NAMED by it (`v=<batchId>`), so
  *    table and watermark can never drift apart;
  *  - a delivered batch with id ≤ the watermark is a replay and is
  *    SKIPPED — the fold is idempotent per batch id;
  *  - each fold publishes a complete new table version and only then
  *    retires the old one, so readers always see exactly one fully
  *    committed table.
  *
  * ATOMIC PUBLISH, rename-free: a fold writes the merged table to its
  * own fresh directory `v=<batchId>` and then creates a commit marker
  * file inside it (leading underscore — invisible to Spark's parquet
  * reader). "Current table" is defined as THE HIGHEST-id directory
  * THAT HAS A MARKER. A crash mid-write leaves a marker-less (torn)
  * directory that readers ignore and the batch's re-delivery simply
  * overwrites; a crash after the marker but before old-version cleanup
  * leaves two committed versions, of which readers use the newer and
  * the next fold prunes the older. This is the same commit discipline
  * as [[LakeIngest.compactDay]]'s staging-swap, with the version-id
  * namespace replacing the rename — deliberate: directory renames are
  * not atomic on object stores, while "create a marker file, pick the
  * max committed id" is correct on any store with atomic single-file
  * creation.
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
    * parquet write completes; its presence defines "committed". Our
    * own file rather than Spark's `_SUCCESS`, which can be disabled by
    * committer configuration.
    */
  val Marker = "_GRAFT_COMMITTED"

  private val VersionPrefix = "v="

  private def fileSystem(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All version ids present under `path`, committed or torn. */
  private def versionIds(spark: SparkSession, path: String,
      committedOnly: Boolean): Seq[Long] = {
    val root = new Path(path)
    val fs = fileSystem(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(VersionPrefix))
      .flatMap(p => p.getName.stripPrefix(VersionPrefix).toLongOption
        .map(id => (id, p)))
      .filter { case (_, p) =>
        !committedOnly || fs.exists(new Path(p, Marker)) }
      .map(_._1)
  }

  /** The persisted watermark: the highest micro-batch id whose fold is
    * fully committed, or None for an empty store. A batch with id ≤
    * this has already been absorbed — re-delivery must be skipped.
    */
  def lastFolded(spark: SparkSession, path: String): Option[Long] =
    versionIds(spark, path, committedOnly = true).maxOption

  /** The current maintained table — the highest COMMITTED version; a
    * torn directory from a crashed fold is never visible here. None if
    * nothing has been committed yet.
    */
  def readStats(spark: SparkSession, path: String): Option[DataFrame] =
    lastFolded(spark, path).map(id =>
      spark.read.parquet(s"$path/$VersionPrefix$id"))

  /** Fold one delivered micro-batch into the maintained store.
    * Idempotent per batch id: a replay (id ≤ the persisted watermark)
    * returns false and leaves the store untouched — this is what makes
    * the loop safe under foreachBatch's at-least-once delivery.
    *
    * Commit order within a successful fold:
    *  1. merged table written to the fresh `v=<batchId>` directory
    *     (reads the previous version's files; never writes where it
    *     reads, so a torn write cannot damage the current table);
    *  2. marker created — THE commit point: the watermark and the new
    *     table become visible together, atomically;
    *  3. older version directories (and any torn debris) deleted; a
    *     crash before this step only defers cleanup to the next fold.
    *
    * @param partialOf batch → aggregated partial with exactly the
    *                  (keys ++ counts) columns (e.g.
    *                  `CorpusStats.lineDf(_, "doc_id", "text")`)
    * @return true if the batch was folded, false if skipped as a replay
    */
  def foldBatch(batch: DataFrame, batchId: Long, path: String,
      keys: Seq[String], counts: Seq[String],
      partialOf: DataFrame => DataFrame): Boolean = {
    require(batchId >= 0, s"negative batchId: $batchId")
    val spark = batch.sparkSession
    val watermark = lastFolded(spark, path)
    if (watermark.exists(batchId <= _)) return false
    val partial = partialOf(batch)
    val merged = readStats(spark, path) match {
      case Some(current) =>
        CorpusStats.mergeStats(Seq(current, partial), keys, counts)
      case None =>
        partial.select((keys ++ counts).map(org.apache.spark.sql.functions.col): _*)
    }
    val fs = fileSystem(spark, path)
    val versionDir = new Path(path, s"$VersionPrefix$batchId")
    // overwrite clears any torn debris this same batch id left behind
    merged.write.mode("overwrite").parquet(versionDir.toString)
    fs.create(new Path(versionDir, Marker), true).close() // commit point
    versionIds(spark, path, committedOnly = false)
      .filter(_ != batchId)
      .foreach { id =>
        val stale = new Path(path, s"$VersionPrefix$id")
        require(fs.delete(stale, true),
          s"delete of superseded stats version $stale failed - leaving " +
            "it cannot double-count (readers take the max committed id) " +
            "but the store would grow without bound")
      }
    true
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
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, path, keys, counts, partialOf): Unit
      }
      .start()
}
