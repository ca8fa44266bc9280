package graft.streaming

/** Upstream retry policy — parity with the reference's gRPC client
  * config (/root/reference/internal/client/hermes/client.go:12-29):
  * maxAttempts 4, initial backoff 10 ms, multiplier 2, backoff cap 1 s,
  * retrying only errors the caller classifies as transient (the
  * reference retries only UNAVAILABLE). Round 1 had no equivalent: a
  * flaky fetch aborted the whole poll tick with no in-cycle retry.
  *
  * `sleep` is injectable so tests don't wait on real clocks.
  */
final class RetryingFetcher[T](
    underlying: SnapshotFetcher[T],
    maxAttempts: Int = 4,
    initialBackoffMs: Long = 10L,
    maxBackoffMs: Long = 1000L,
    backoffMultiplier: Double = 2.0,
    retryable: Throwable => Boolean = RetryingFetcher.defaultRetryable,
    sleep: Long => Unit = Thread.sleep) extends SnapshotFetcher[T] {

  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  override def fetch(knownHash: Option[String]): FetchResult[T] = {
    var attempt = 1
    var backoff = initialBackoffMs
    while (true) {
      try return underlying.fetch(knownHash)
      catch {
        case e: Throwable if retryable(e) && attempt < maxAttempts =>
          sleep(backoff)
          backoff = math.min((backoff * backoffMultiplier).toLong, maxBackoffMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object RetryingFetcher {
  /** Transient-by-default: IO and timeout failures retry; anything
    * else (parse errors, assertion failures) fails fast — the analogue
    * of retrying UNAVAILABLE but not INVALID_ARGUMENT.
    */
  def defaultRetryable(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case _: java.util.concurrent.TimeoutException => true
    case _ => false
  }
}
