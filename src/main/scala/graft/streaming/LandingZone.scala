package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Landing-zone retention. The reference holds no landing state (it
  * streams gRPC straight to Postgres), but the Spark build stages
  * payload files for the Structured Streaming file source — and a file
  * source grows unboundedly unless something removes processed files.
  *
  * Two mechanisms, complementary:
  *
  *  1. The streams pass `cleanSource` through to Spark's file source
  *     (see [[Pipelines]]): Spark itself deletes/archives a batch's
  *     files when the NEXT batch commits (the source's commit() lags
  *     one batch — verified in StreamingSpec), so the zone stays
  *     bounded with a one-run tail; safe because only COMMITTED files
  *     are cleaned.
  *  2. [[sweep]] — an age-based safety net for files the source will
  *     never clean (batch-read backfill dirs, files written before
  *     cleanSource was enabled, archived files). Age-based deletion is
  *     safe for committed-or-abandoned data only; retention must
  *     exceed the longest conceivable processing lag (default
  *     GRAFT_LANDING_RETENTION = 7d against a 10-minute trigger).
  *
  * Uses the Hadoop FileSystem API, so it works unchanged on HDFS/S3A
  * at cluster scale — no java.io.File assumptions.
  */
object LandingZone {

  /** Delete files under `dir` (non-recursive) older than `olderThanMs`.
    * Returns the number of files deleted. Missing dir is a no-op.
    */
  def sweep(spark: SparkSession, dir: String, olderThanMs: Long,
      nowMs: Long = System.currentTimeMillis()): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return 0L
    val cutoff = nowMs - olderThanMs
    var deleted = 0L
    val it = fs.listStatusIterator(path)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getModificationTime < cutoff) {
        if (fs.delete(st.getPath, false)) deleted += 1
      }
    }
    deleted
  }
}
