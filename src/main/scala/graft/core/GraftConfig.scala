package graft.core

import scala.concurrent.duration.{Duration, FiniteDuration}

/** Environment-driven runtime configuration — parity with the
  * reference's env surface (/root/reference/internal/config/config.go:27-48):
  *
  * | reference env          | graft env           | default      |
  * |------------------------|---------------------|--------------|
  * | HEPHAESTUS_INTERVAL    | GRAFT_INTERVAL      | 10m          |
  * | HEPHAESTUS_ENV         | GRAFT_ENV           | production   |
  * | DB_HOST/PORT/USER/...  | GRAFT_JDBC_URL      | (none)       |
  * | HERMES_ADDRESS         | GRAFT_UPSTREAM_ADDR | (none)       |
  * | (monitoring port, main.go) | GRAFT_MONITOR_PORT | 8080      |
  * | n/a (Spark-side only)  | GRAFT_LANDING_DIR   | (none)       |
  * | n/a (Spark-side only)  | GRAFT_CHECKPOINT_DIR| (none)       |
  * | n/a (Spark-side only)  | GRAFT_LANDING_RETENTION | 7d       |
  *
  * The JDBC URL replaces the reference's five discrete DB_* vars
  * because Spark's JDBC layer takes one connection string; credentials
  * ride in the URL or a property file, never in code.
  *
  * Durations accept Scala syntax ("10m", "90s", "1h") like Go's
  * ParseDuration accepts "10m".
  */
final case class GraftConfig(
    env: String,
    interval: FiniteDuration,
    jdbcUrl: Option[String],
    upstreamAddr: Option[String],
    monitorPort: Int,
    landingDir: Option[String],
    checkpointDir: Option[String],
    landingRetention: FiniteDuration)

object GraftConfig {

  def fromEnv(getenv: String => Option[String] = k => sys.env.get(k)): GraftConfig =
    GraftConfig(
      env = getenv("GRAFT_ENV").getOrElse("production"),
      interval = duration(getenv("GRAFT_INTERVAL").getOrElse("10m"), "GRAFT_INTERVAL"),
      jdbcUrl = getenv("GRAFT_JDBC_URL"),
      upstreamAddr = getenv("GRAFT_UPSTREAM_ADDR"),
      monitorPort = getenv("GRAFT_MONITOR_PORT").map(_.toInt).getOrElse(8080),
      landingDir = getenv("GRAFT_LANDING_DIR"),
      checkpointDir = getenv("GRAFT_CHECKPOINT_DIR"),
      landingRetention =
        duration(getenv("GRAFT_LANDING_RETENTION").getOrElse("7d"), "GRAFT_LANDING_RETENTION"))

  private def duration(s: String, key: String): FiniteDuration =
    Duration(s) match {
      case d: FiniteDuration => d
      case _ => throw new IllegalArgumentException(s"$key must be finite, got '$s'")
    }
}
