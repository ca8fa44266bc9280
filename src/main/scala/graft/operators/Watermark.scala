package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Dates

/** Watermark / incremental-progress operators (S5/S6/K6/A1,
  * /root/reference/internal/repository/scraper_status.go:10-46 and
  * tasks.go:79-127,165).
  *
  * In the streaming pipeline the Structured Streaming checkpoint
  * replaces this table; these operators exist for API parity (the
  * reference exposes `scraper_status` to other processes) and for the
  * batch backfill driver.
  */
object Watermark {

  /** S5/A1: latest watermark — `ORDER BY updated_at DESC LIMIT 1`,
    * expressed as `max_by` so it aggregates map-side instead of
    * globally sorting (same plan shape at any scale).
    */
  def latest(status: DataFrame, dateCol: String, updatedCol: String): DataFrame =
    status.agg(max_by(col(dateCol), col(updatedCol)).as(dateCol))

  /** S6: latest watermark with the 2024-01-01 epoch default
    * (tasks.go:178-189).
    */
  def latestOrEpoch(status: DataFrame, dateCol: String,
      updatedCol: String): DataFrame =
    status.agg(coalesce(max_by(col(dateCol), col(updatedCol)), Dates.epochTs)
      .as(dateCol))

  /** K6 advance rule: watermark := processed date + 1 day (tasks.go:165). */
  def advance(processedDay: Column): Column =
    Dates.normalizeDay(processedDay) + expr("INTERVAL 1 DAY")

  /** Backfill driver's date range: every day from the watermark up to
    * `today` inclusive (tasks.go:79-127 processes day-by-day, aborting
    * on first failure — ordering preserved by the ascending sequence).
    * Returned as a DataFrame so the per-date work can be planned
    * without a driver-side loop when dates are independent.
    */
  def backfillDays(spark: org.apache.spark.sql.SparkSession,
      from: java.sql.Timestamp, today: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    Seq((from, today)).toDF("__from", "__to")
      .select(explode(sequence(
        Dates.normalizeDay(col("__from")),
        Dates.normalizeDay(col("__to")),
        expr("INTERVAL 1 DAY"))).as("day"))
  }
}
