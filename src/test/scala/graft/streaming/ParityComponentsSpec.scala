package graft.streaming

import java.io.IOException
import java.nio.file.Files

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.GraftConfig

/** Round-2 parity components: upstream retry/backoff (client.go:12-29),
  * env-config surface (config.go:27-48), landing-zone retention.
  */
class ParityComponentsSpec extends SparkSpec {

  private class FlakyFetcher(failures: Int, err: => Throwable)
    extends SnapshotFetcher[String] {
    var calls = 0
    override def fetch(knownHash: Option[String]): FetchResult[String] = {
      calls += 1
      if (calls <= failures) throw err
      FetchResult("h" + calls, Seq("item"))
    }
  }

  test("retry: transient failures retried with exponential backoff, then succeed") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new FlakyFetcher(2, new IOException("conn reset"))
    val r = new RetryingFetcher(flaky, sleep = sleeps += _)
    assert(r.fetch(None).newHash == "h3")
    assert(flaky.calls == 3)
    assert(sleeps.toSeq == Seq(10L, 20L), "10ms initial, x2 multiplier")
  }

  test("retry: backoff caps at maxBackoff and attempts are bounded") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val alwaysDown = new FlakyFetcher(Int.MaxValue, new IOException("down"))
    val r = new RetryingFetcher(alwaysDown, maxAttempts = 5,
      initialBackoffMs = 400L, sleep = sleeps += _)
    intercept[IOException] { r.fetch(None) }
    assert(alwaysDown.calls == 5, "4 retries after the first attempt, then give up")
    assert(sleeps.toSeq == Seq(400L, 800L, 1000L, 1000L), "capped at 1s")
  }

  test("retry: non-transient errors fail fast") {
    val broken = new FlakyFetcher(Int.MaxValue, new IllegalStateException("bad proto"))
    val r = new RetryingFetcher(broken)
    intercept[IllegalStateException] { r.fetch(None) }
    assert(broken.calls == 1, "INVALID_ARGUMENT-class errors must not retry")
  }

  test("retrying poller end-to-end: hash gate sees the post-retry result") {
    val flaky = new FlakyFetcher(1, new IOException("blip"))
    var batches = 0
    val poller = new HashGatedPoller[String](
      new RetryingFetcher(flaky, sleep = _ => ()), _ => batches += 1)
    assert(poller.poll())
    assert(batches == 1)
    assert(poller.knownHash.contains("h2"))
  }

  test("config: defaults match the reference's (10m interval, production env)") {
    val c = GraftConfig.fromEnv(_ => None)
    assert(c.interval == 10.minutes)
    assert(c.env == "production")
    assert(c.monitorPort == 8080)
    assert(c.landingRetention == 7.days)
    assert(c.jdbcUrl.isEmpty && c.landingDir.isEmpty)
  }

  test("config: env overrides parse durations and ports") {
    val env = Map(
      "GRAFT_INTERVAL" -> "90s", "GRAFT_ENV" -> "dev",
      "GRAFT_MONITOR_PORT" -> "9091", "GRAFT_JDBC_URL" -> "jdbc:derby:memory:x",
      "GRAFT_LANDING_RETENTION" -> "36h")
    val c = GraftConfig.fromEnv(env.get)
    assert(c.interval == 90.seconds)
    assert(c.env == "dev")
    assert(c.monitorPort == 9091)
    assert(c.jdbcUrl.contains("jdbc:derby:memory:x"))
    assert(c.landingRetention == 36.hours)
    intercept[Exception] { GraftConfig.fromEnv(Map("GRAFT_INTERVAL" -> "soon").get) }
  }

  test("orchestrator: graceful shutdown stops streams then monitor, idempotently") {
    val ckpt = Files.createTempDirectory("graft-orch-ckpt").toString
    try {
      val q = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .writeStream.format("noop").option("checkpointLocation", ckpt).start()
      val metrics = new graft.observability.Metrics
      val srv = new graft.observability.MonitoringServer(0, metrics,
        () => true, () => graft.observability.Health.UpstreamOk)
      srv.start()
      val orch = new Orchestrator(Seq(q), Some(srv)).registerShutdownHook()
      assert(q.isActive)
      orch.shutdown()
      assert(!q.isActive, "stream drained and stopped")
      orch.shutdown() // second call must be a no-op, not a double-stop error
    } finally {
      scala.reflect.io.Directory(new java.io.File(ckpt)).deleteRecursively(): Unit
    }
  }

  test("landing-zone sweep deletes only files past retention") {
    val dir = Files.createTempDirectory("graft-landing").toFile
    val old1 = new java.io.File(dir, "batch-old.json")
    val old2 = new java.io.File(dir, "batch-old2.json")
    val fresh = new java.io.File(dir, "batch-new.json")
    Seq(old1, old2, fresh).foreach { f =>
      Files.write(f.toPath, "{}".getBytes)
    }
    val now = System.currentTimeMillis()
    old1.setLastModified(now - 10.days.toMillis)
    old2.setLastModified(now - 8.days.toMillis)
    fresh.setLastModified(now - 1.hour.toMillis)
    val deleted = LandingZone.sweep(spark, dir.getAbsolutePath,
      olderThanMs = 7.days.toMillis, nowMs = now)
    assert(deleted == 2)
    assert(!old1.exists() && !old2.exists() && fresh.exists())
    // missing dir is a no-op
    assert(LandingZone.sweep(spark, dir.getAbsolutePath + "/nope", 0L, now) == 0L)
    scala.reflect.io.Directory(dir).deleteRecursively(): Unit
  }
}
