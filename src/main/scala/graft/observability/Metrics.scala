package graft.observability

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}

import scala.jdk.CollectionConverters._

/** Minimal Prometheus-compatible metrics registry, mirroring the
  * reference's six instruments name-for-name
  * (/root/reference/internal/metrics/metrics.go:30-60):
  *
  *  - hephaestus_runs_total{status}
  *  - hephaestus_items_parsed_total{type}
  *  - hephaestus_last_successful_run_timestamp{type}
  *  - hephaestus_run_duration_seconds{type} (histogram)
  *  - hephaestus_emails_fixed_total
  *  - hephaestus_db_query_duration_seconds{query_type} (histogram)
  *
  * No client library exists in this build (zero-egress), so the text
  * exposition format is produced directly; instruments are lock-free
  * adders safe for concurrent foreachBatch threads.
  */
final class Metrics {

  /** prometheus.DefBuckets — the reference uses the defaults. */
  val DefBuckets: Seq[Double] =
    Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

  private val counters = new ConcurrentHashMap[(String, Seq[String]), DoubleAdder]()
  private val gauges = new ConcurrentHashMap[(String, Seq[String]), java.util.concurrent.atomic.AtomicLong]()
  private final class Histo {
    val bucketCounts = Array.fill(DefBuckets.size)(new LongAdder)
    val count = new LongAdder
    val sum = new DoubleAdder
    def observe(v: Double): Unit = {
      var i = 0
      while (i < DefBuckets.size) {
        if (v <= DefBuckets(i)) bucketCounts(i).increment()
        i += 1
      }
      count.increment(); sum.add(v)
    }
  }
  private val histos = new ConcurrentHashMap[(String, Seq[String]), Histo]()

  // instrument surface (names fixed to the reference's)
  def incRuns(status: String, n: Double = 1): Unit = inc("hephaestus_runs_total", Seq("status" -> status), n)
  def incItemsParsed(tpe: String, n: Double): Unit = inc("hephaestus_items_parsed_total", Seq("type" -> tpe), n)
  def setLastSuccessfulRun(tpe: String, epochSec: Long): Unit =
    gauges.computeIfAbsent(key("hephaestus_last_successful_run_timestamp", Seq("type" -> tpe)),
      _ => new java.util.concurrent.atomic.AtomicLong()).set(epochSec)
  def observeRunDuration(tpe: String, sec: Double): Unit =
    histos.computeIfAbsent(key("hephaestus_run_duration_seconds", Seq("type" -> tpe)), _ => new Histo).observe(sec)
  def incEmailsFixed(n: Double): Unit = inc("hephaestus_emails_fixed_total", Nil, n)
  def observeDbQuery(queryType: String, sec: Double): Unit =
    histos.computeIfAbsent(key("hephaestus_db_query_duration_seconds", Seq("query_type" -> queryType)), _ => new Histo).observe(sec)

  def time[T](record: Double => Unit)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally record((System.nanoTime() - t0) / 1e9)
  }

  private def key(name: String, labels: Seq[(String, String)]): (String, Seq[String]) =
    (name, labels.map { case (k, v) => s"""$k="$v"""" })
  private def inc(name: String, labels: Seq[(String, String)], n: Double): Unit =
    counters.computeIfAbsent(key(name, labels), _ => new DoubleAdder).add(n)

  def counterValue(name: String, labels: (String, String)*): Double =
    Option(counters.get(key(name, labels.toSeq))).map(_.sum()).getOrElse(0.0)

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def lbl(ls: Seq[String], extra: String = ""): String = {
    val all = ls ++ (if (extra.nonEmpty) Seq(extra) else Nil)
    if (all.isEmpty) "" else all.mkString("{", ",", "}")
  }

  /** Prometheus text exposition (served at /metrics, server.go:72). */
  def exposition: String = {
    val sb = new StringBuilder
    counters.asScala.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), v) =>
      sb.append(s"$n${lbl(ls)} ${fmt(v.sum())}\n")
    }
    gauges.asScala.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), v) =>
      sb.append(s"$n${lbl(ls)} ${v.get()}\n")
    }
    histos.asScala.toSeq.sortBy(_._1.toString).foreach { case ((n, ls), h) =>
      DefBuckets.zipWithIndex.foreach { case (b, i) =>
        sb.append(s"${n}_bucket${lbl(ls, s"""le="$b"""")} ${h.bucketCounts(i).sum()}\n")
      }
      sb.append(s"${n}_bucket${lbl(ls, """le="+Inf"""")} ${h.count.sum()}\n")
      sb.append(s"${n}_sum${lbl(ls)} ${h.sum.sum()}\n")
      sb.append(s"${n}_count${lbl(ls)} ${h.count.sum()}\n")
    }
    sb.toString
  }
}
