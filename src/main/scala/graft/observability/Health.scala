package graft.observability

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** /healthz + /metrics monitoring endpoints — exact contract of the
  * reference's monitoring server
  * (/root/reference/internal/server/health.go:31-73, server.go:60-102):
  *
  *  - body is `{"database": <s>, "hermes_service": <s>}` where
  *    database ∈ {ok, unavailable} and upstream ∈ {ok, degraded,
  *    unreachable} (key order alphabetical, matching Go's
  *    json.Encoder over a map);
  *  - 200 iff both ok, else 503 (health_test.go:66,96,126,148).
  */
object Health {

  sealed trait UpstreamStatus { def label: String }
  case object UpstreamOk extends UpstreamStatus { val label = "ok" }
  case object UpstreamDegraded extends UpstreamStatus { val label = "degraded" }
  case object UpstreamUnreachable extends UpstreamStatus { val label = "unreachable" }

  /** Runs both probes; returns (httpStatus, jsonBody). */
  def check(dbPing: () => Boolean, upstream: () => UpstreamStatus): (Int, String) = {
    val db = try dbPing() catch { case _: Throwable => false }
    val up = try upstream() catch { case _: Throwable => UpstreamUnreachable }
    val dbLabel = if (db) "ok" else "unavailable"
    val status = if (db && up == UpstreamOk) 200 else 503
    (status, s"""{"database":"$dbLabel","hermes_service":"${up.label}"}""")
  }

  /** JDBC ping (reference: pgxpool Ping, health.go:38). */
  def jdbcPing(cf: () => java.sql.Connection): () => Boolean = () =>
    try {
      val c = cf()
      try c.isValid(5) finally c.close()
    } catch { case _: Throwable => false }
}

/** Driver-side monitoring HTTP server (reference server.go:60-102;
  * /metrics at :72, /healthz at :71). JDK built-in HttpServer — no
  * extra dependency, good enough for a scrape endpoint.
  */
final class MonitoringServer(port: Int, metrics: Metrics,
    dbPing: () => Boolean, upstream: () => Health.UpstreamStatus) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: HttpExchange, status: Int, body: String,
      contentType: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/healthz", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (status, body) = Health.check(dbPing, upstream)
      respond(ex, status, body, "application/json")
    }
  })
  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex, 200, metrics.exposition, "text/plain; version=0.0.4")
  })

  def start(): Unit = server.start()
  def actualPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
