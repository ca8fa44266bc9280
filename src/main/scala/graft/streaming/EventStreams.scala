package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over Structured Streaming: watermarked
  * windowed aggregation and custom sessionization state — the
  * streaming counterparts of the batch `q_window_running` /
  * `q_sessionize` queries.
  *
  * Scale: both shapes shuffle once on their grouping key; state lives
  * in the state store (RocksDB/HDFS-backed on a cluster), bounded by
  * the watermark/timeout — nothing accumulates on the driver.
  */
object EventStreams {

  /** Tumbling-window event counts/sums with a 10-minute watermark:
    * late events beyond the watermark are dropped, window state is
    * evicted once the watermark passes — bounded state at any scale.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup with watermark-bounded state: a duplicate
    * key arriving within the watermark delay of the first sighting is
    * dropped; state for a key is evicted once the watermark passes it.
    * The streaming form of the batch A4/exact-dedup operators — the
    * state bound is what makes it safe on an unbounded stream (a plain
    * streaming dropDuplicates grows keys forever).
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(sessionStart: Long, lastSeen: Long,
      nEvents: Long, totalValue: Double)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session closes when a later event
    * arrives past the gap (emitted exactly once); with
    * `ProcessingTimeTimeout` the trailing session of an idle user is
    * also flushed after the gap elapses in processing time. State per
    * user is O(1) — counters, not events.
    *
    * `timeout` defaults to NoTimeout (deterministic, test-friendly);
    * production streams pass ProcessingTimeTimeout so idle users
    * eventually emit — note that mode keeps scheduling micro-batches
    * to fire timers even without input.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var out = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime / 1000
        cur match {
          case Some(s) if t - s.lastSeen > gapSec =>
            out ::= SessionOut(userId, new Timestamp(s.sessionStart * 1000),
              new Timestamp(s.lastSeen * 1000), s.nEvents, s.totalValue)
            cur = Some(SessionState(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(s.copy(lastSeen = t, nEvents = s.nEvents + 1,
              totalValue = s.totalValue + e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        val closed = cur.map(s => SessionOut(userId,
          new Timestamp(s.sessionStart * 1000),
          new Timestamp(s.lastSeen * 1000), s.nEvents, s.totalValue))
        state.remove()
        closed.iterator ++ out.reverseIterator
      } else {
        cur.foreach { s =>
          state.update(s)
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
            state.setTimeoutDuration(gapSec * 1000)
        }
        out.reverseIterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update)
  }
}
