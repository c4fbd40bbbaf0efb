package graft.sources

/** Driver-side ingestion utilities — the reference's network discipline
  * re-expressed as deterministic, dependency-injected Scala (SURVEY
  * §2.1 scoped these out of Catalyst; they live here as the driver
  * tooling a Spark ingest job wraps around its landing writes).
  * Everything takes its clock/sleeper/RNG as arguments, so the specs
  * pin exact schedules with no wall-clock flakiness.
  *
  *  - [[TokenBucket]] — token-bucket rate limiter
  *    (`src/lib/jquants/rate-limiter.ts:26-110`): N requests/min with a
  *    minimum inter-request interval; fractional refill proportional to
  *    elapsed time, capacity-capped.
  *  - [[Retry]] — exponential backoff with jitter
  *    (`src/lib/utils/retry.ts:92-148,161-191`): 429/5xx retry,
  *    401/403 fail fast, base·2^attempt capped at max, + uniform
  *    jitter.
  *  - [[Paginate]] — the pagination_key fetch loop
  *    (`src/lib/jquants/client.ts:172-204`): follow the cursor until
  *    absent, fail loud at the page cap (the reference's max 1000).
  */
object Ingest {

  /** Token bucket: `requestsPerMinute` capacity, fractional refill at
    * requestsPerMinute/60000 tokens per ms, plus a `minIntervalMs`
    * floor between consecutive acquires. `nowMs` is the injected clock;
    * `sleepMs` the injected sleeper (tests record instead of sleeping). */
  final class TokenBucket(requestsPerMinute: Int = 60,
                          minIntervalMs: Long = 1000L,
                          nowMs: () => Long = () => System.currentTimeMillis(),
                          sleepMs: Long => Unit = Thread.sleep(_)) {
    private val capacity = requestsPerMinute.toDouble
    private var tokens = capacity
    private var lastRefill = nowMs()
    private var lastRequest = Long.MinValue / 2

    private def refill(): Unit = {
      val now = nowMs()
      tokens = math.min(capacity,
        tokens + (now - lastRefill) / 60000.0 * requestsPerMinute)
      lastRefill = now
    }

    /** Wait needed before the next request may fire, in ms: the MAX of
      * the refill wait and the interval-floor wait — a starved bucket
      * must still honor `minIntervalMs` (taking only the refill wait
      * would let back-to-back acquires violate the floor whenever
      * requestsPerMinute > 60000/minIntervalMs). */
    def waitTimeMs(): Long = synchronized { waitLocked() }

    private def waitLocked(): Long = {
      refill()
      val since = nowMs() - lastRequest
      val intervalWait =
        if (since < minIntervalMs) minIntervalMs - since else 0L
      val refillWait =
        if (tokens >= 1.0) 0L
        else {
          val msPerToken = 60000.0 / requestsPerMinute
          math.ceil((1.0 - tokens) * msPerToken).toLong
        }
      math.max(intervalWait, refillWait)
    }

    /** Consume one token, sleeping first if the bucket or the interval
      * floor requires it. Sleeps OUTSIDE the monitor (a waiter must not
      * serialize `availableTokens`/`waitTimeMs` observers) and re-checks
      * the wait after waking: another caller may have consumed the
      * refilled token first. */
    def acquire(): Unit = {
      while (true) {
        val w = synchronized {
          val w0 = waitLocked()
          if (w0 == 0L) {
            tokens -= 1.0
            lastRequest = nowMs()
            return
          }
          w0
        }
        sleepMs(w)
      }
    }

    def availableTokens: Int = synchronized { refill(); tokens.toInt }

    def reset(): Unit = synchronized {
      tokens = capacity; lastRefill = nowMs(); lastRequest = Long.MinValue / 2
    }
  }

  /** Transient failure (429/5xx analog) — retried with backoff. */
  final case class RetryableError(msg: String, statusCode: Int = 0)
      extends RuntimeException(msg)
  /** Permanent failure (401/403 analog) — fails fast, never retried. */
  final case class NonRetryableError(msg: String, statusCode: Int = 0)
      extends RuntimeException(msg)

  object Retry {
    /** Status codes retried by default — the reference's set. */
    val RetryStatusCodes: Set[Int] = Set(429, 500, 502, 503, 504)

    /** Backoff before retry #`attempt` (0-based): base·2^attempt capped
      * at max, plus uniform jitter in [0, jitterMs). Pure given the
      * injected uniform draw. */
    def delayMs(attempt: Int, baseDelayMs: Long = 500L,
                maxDelayMs: Long = 32000L, jitterMs: Long = 100L,
                uniform: () => Double = () => 0.0): Long =
      math.min(baseDelayMs * (1L << attempt), maxDelayMs) +
        (uniform() * jitterMs).toLong

    /** Classify an HTTP status the way the reference's fetch wrapper
      * does: retryable set → [[RetryableError]], anything else non-2xx
      * (401/403 included) → [[NonRetryableError]]. */
    def classify(statusCode: Int, msg: String = ""): Option[RuntimeException] =
      if (statusCode >= 200 && statusCode < 300) None
      else if (RetryStatusCodes(statusCode))
        Some(RetryableError(s"HTTP $statusCode: $msg", statusCode))
      else Some(NonRetryableError(s"HTTP $statusCode: $msg", statusCode))

    /** Run `fn` with up to `maxRetries` retries: [[RetryableError]]s
      * back off and retry; [[NonRetryableError]]s and any other
      * throwable propagate immediately; the last error propagates when
      * attempts are exhausted. `onRetry(attempt, delay)` observes the
      * schedule (the reference's callback). */
    def withRetry[T](fn: () => T, maxRetries: Int = 5,
                     baseDelayMs: Long = 500L, maxDelayMs: Long = 32000L,
                     jitterMs: Long = 100L,
                     uniform: () => Double = () => 0.0,
                     sleepMs: Long => Unit = Thread.sleep(_),
                     onRetry: (Int, Long) => Unit = (_, _) => ()): T = {
      var attempt = 0
      while (true) {
        try return fn()
        catch {
          case e: RetryableError =>
            if (attempt == maxRetries) throw e
            val d = delayMs(attempt, baseDelayMs, maxDelayMs, jitterMs, uniform)
            onRetry(attempt + 1, d)
            sleepMs(d)
            attempt += 1
        }
      }
      sys.error("unreachable")
    }
  }

  object Paginate {
    /** Follow a `pagination_key` cursor to exhaustion: `fetch(cursor)`
      * returns one page of rows plus the next cursor (None = last
      * page). Fails LOUD at `maxPages` (the reference stops at 1000 and
      * logs — a silent stop truncates data; here truncation is an
      * error). */
    def fetchAll[T](fetch: Option[String] => (Seq[T], Option[String]),
                    maxPages: Int = 1000): Vector[T] = {
      val out = Vector.newBuilder[T]
      foreachPage(fetch, maxPages)(out ++= _)
      out.result()
    }

    /** The same cursor-to-exhaustion loop, streaming each page to
      * `onPage` instead of accumulating — the chunked-landing sink
      * shape ([[graft.jobs.LandingJob]] spools pages to staging with
      * bounded driver residency). One copy of the pagination/
      * truncation discipline serves both. */
    def foreachPage[T](fetch: Option[String] => (Seq[T], Option[String]),
                       maxPages: Int = 1000)(onPage: Seq[T] => Unit): Unit = {
      var cursor: Option[String] = None
      var pages = 0
      var done = false
      while (!done) {
        require(pages < maxPages,
          s"pagination exceeded $maxPages pages — refusing to truncate")
        val (rows, next) = fetch(cursor)
        onPage(rows)
        pages += 1
        cursor = next
        done = next.isEmpty
      }
    }
  }
}
