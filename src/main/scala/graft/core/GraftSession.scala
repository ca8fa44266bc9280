package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Scale posture: these settings are the local[N] analogue of what the
  * engine would set on a 1000-executor cluster — AQE on (runtime shuffle
  * coalescing + skew-join splitting), shuffle partitions sized to the
  * parallelism actually available instead of the 200 default, UTC
  * session time zone (the reference normalizes all timestamps to UTC,
  * /root/reference/internal/services/tasks/tasks.go:91-104).
  */
object GraftSession {

  def builder(cores: String): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", if (cores == "*") "32" else cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: String = "*"): SparkSession = builder(cores).getOrCreate()
}
