package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.streaming.StreamingQuery

import graft.observability.MonitoringServer

/** Graceful shutdown for the driver process — parity with the
  * reference's signal handling (/root/reference/cmd/main/main.go:37:
  * signal context cancels the pollers, a WaitGroup drains them, then
  * the monitoring server stops).
  *
  * Order matters and mirrors startup in reverse: streams stop first
  * (each `StreamingQuery.stop()` interrupts its trigger thread and
  * waits for the in-flight micro-batch to finish or abort — a
  * committed batch stays committed, an aborted one replays from the
  * checkpoint on restart, absorbed by the idempotent MERGE sink), the
  * monitoring server last so /healthz stays observable through the
  * drain.
  *
  * Idempotent: the JVM shutdown hook and an explicit `shutdown()` call
  * can race without double-stopping.
  */
final class Orchestrator(streams: Seq[StreamingQuery],
    monitor: Option[MonitoringServer]) {

  private val done = new AtomicBoolean(false)

  def shutdown(): Unit =
    if (done.compareAndSet(false, true)) {
      streams.reverse.foreach { q =>
        try q.stop()
        catch { case e: Throwable =>
          System.err.println(s"[orchestrator] stop ${q.name}: ${e.getMessage}")
        }
      }
      monitor.foreach(_.stop())
    }

  /** Install a SIGTERM/SIGINT-driven shutdown (JVM shutdown hook — the
    * portable equivalent of the reference's signal.NotifyContext).
    */
  def registerShutdownHook(): this.type = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => shutdown(), "graft-shutdown"))
    this
  }

  /** Block until every stream terminates (normally or by error). */
  def awaitAll(): Unit = streams.foreach(_.awaitTermination())
}
