package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date normalization (T7/T9/S6 in SURVEY.md §2). */
object Dates {

  /** Watermark epoch default: missing watermark ⇒ 2024-01-01 UTC
    * (/root/reference/internal/services/tasks/tasks.go:182).
    */
  val Epoch = "2024-01-01 00:00:00"

  def epochTs: Column = lit(Epoch).cast("timestamp")

  /** T7: truncate to UTC midnight
    * (/root/reference/internal/services/tasks/tasks.go:135-138).
    */
  def normalizeDay(ts: Column): Column = date_trunc("DAY", ts)

  /** T7: `yyyy-MM-dd` partition-date string (tasks.go:138). */
  def formatDay(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** T9: Go zero-time (0001-01-01, open tasks — models/task.go:21)
    * mapped to NULL. Cleaner than propagating a sentinel; divergence
    * documented in SURVEY.md §2.3 T9.
    */
  def zeroTimeToNull(ts: Column): Column =
    when(year(ts) < 1970, lit(null).cast("timestamp")).otherwise(ts)
}
