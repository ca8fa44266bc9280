package graft.streaming

import java.sql.Timestamp
import java.time.{Instant, ZoneOffset}
import java.time.temporal.ChronoUnit

/** Day-by-day catch-up driver — the reference's watermark backfill
  * loop (/root/reference/internal/services/tasks/tasks.go:79-127):
  * read watermark → process that day → advance watermark (+1 day) →
  * repeat until past `today`; abort on the first failed date (no
  * skip-ahead — order is the correctness guarantee for downstream
  * consumers of the watermark).
  *
  * Dates are intentionally processed sequentially here for parity; a
  * Spark-first alternative when per-day independence holds is one
  * batch read over the whole date range with `Trigger.AvailableNow`
  * (SURVEY.md §2.6 "Backfill"), which this driver does not preclude —
  * `processDate` can itself be a Spark job of any width.
  */
object Backfill {

  def truncateDay(t: Timestamp): Timestamp =
    Timestamp.from(t.toInstant.atZone(ZoneOffset.UTC)
      .truncatedTo(ChronoUnit.DAYS).toInstant)

  def nextDay(t: Timestamp): Timestamp =
    Timestamp.from(t.toInstant.atZone(ZoneOffset.UTC)
      .truncatedTo(ChronoUnit.DAYS).plusDays(1).toInstant)

  /** Runs the loop; returns the number of days processed. Watermark is
    * written AFTER each day's data lands (tasks.go:157-169) so a crash
    * between the two replays the day — safe against the idempotent
    * MERGE sink.
    */
  def run(from: Timestamp, today: Timestamp,
      processDate: Timestamp => Unit,
      saveWatermark: Timestamp => Unit): Int = {
    var day = truncateDay(from)
    val last = truncateDay(today)
    var n = 0
    while (!day.after(last)) {
      processDate(day)              // throws ⇒ abort, watermark untouched
      saveWatermark(nextDay(day))   // watermark := processed + 1 (tasks.go:165)
      day = nextDay(day)
      n += 1
    }
    n
  }

  def defaultEpoch: Timestamp = Timestamp.from(
    Instant.parse(graft.functions.Dates.Epoch.replace(" ", "T") + "Z"))
}
