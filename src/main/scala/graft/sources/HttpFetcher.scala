package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/** S1 — retried streaming HTTP GET (reference `etl/etl_main.py:61-72`
  * session policy and `:97-105` download loop): up to `maxRetries`
  * retries on connection errors and on HTTP 429/500/502/503/504, with
  * urllib3-style exponential backoff `backoffFactor * 2^(retry-1)`
  * seconds, a 300 s connect/header timeout plus a body-read IDLE watchdog
  * with the same budget (java.net.http's request timeout stops at the
  * response headers; the watchdog is the analog of urllib3's read
  * timeout, which bounds the gap BETWEEN reads, not the whole body — a
  * healthy multi-GB download slower than size/timeout must not be
  * killed mid-stream) plus a progress-proportional attempt ceiling as the
  * drip-feed backstop, and the body streamed to the destination file in
  * 1 MiB chunks (never buffered whole in memory — the reference reads a
  * multi-GB Land Registry file this way).
  *
  * Non-retryable statuses (e.g. 404) fail immediately, mirroring
  * `raise_for_status` after the adapter's retry budget is exhausted.
  * Plugs into [[Sinks.LandingZone.fetch]] as the fetcher, which adds the
  * TTL cache, atomic move, and timestamped backup around it.
  *
  * `sleeper` is injectable so tests assert the backoff schedule without
  * sleeping through it.
  */
final class HttpFetcher(
    url: String,
    maxRetries: Int = 5,
    backoffFactor: Double = 0.5,
    retryStatuses: Set[Int] = HttpFetcher.DefaultRetryStatuses,
    timeout: Duration = Duration.ofSeconds(300),
    attemptCeiling: Option[Duration] = None,
    minThroughputBytesPerSec: Long = 64 * 1024,
    sleeper: Long => Unit = Thread.sleep) extends (Path => Unit) {

  // Backstop against a drip-feeding server that defeats the idle watchdog
  // by sending one byte per idle window. The deadline is
  // PROGRESS-PROPORTIONAL: base ceiling (12x the idle budget — an hour at
  // the reference's 300 s timeout) plus one second of credit per
  // `minThroughputBytesPerSec` delivered, so a drip-feeder (bytes ~ 0)
  // still dies at the base ceiling while any stream averaging at least the
  // floor — 64 KiB/s default, ~0.5 Mbps, far below any Land-Registry-scale
  // link — NEVER hits it regardless of body size: a fixed cap would kill a
  // healthy 5 GB download on a ~10 Mbps line at the one-hour mark, fail
  // every retry the same way, and burn maxRetries hours doing it. (The
  // reference's requests/urllib3 stack has NO cap at all — the backstop is
  // a deliberate robustness addition, since a hung daily run is strictly
  // worse than a failed one.)
  require(minThroughputBytesPerSec >= 1,
    s"minThroughputBytesPerSec=$minThroughputBytesPerSec must be >= 1")
  private val ceilingMillis =
    attemptCeiling.getOrElse(timeout.multipliedBy(12)).toMillis

  private val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    // ALWAYS, not NORMAL: python-requests (the reference's client) follows
    // every redirect including https→http downgrades; NORMAL refuses the
    // downgrade and would fail a run the reference completes.
    .followRedirects(HttpClient.Redirect.ALWAYS)
    .build()

  def apply(dest: Path): Unit = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout).GET().build()
    var attempt = 0
    var done = false
    while (!done) {
      // Left(reason) = retryable failure; Right(()) = success. Permanent
      // failures throw straight out.
      val outcome: Either[String, Unit] =
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
          val code = resp.statusCode()
          // Any 2xx succeeds (204/206 included), like raise_for_status.
          if (code >= 200 && code < 300) {
            val in = resp.body()
            // HttpRequest.timeout only bounds time-to-response-headers; a
            // body stream that stalls mid-read would otherwise block
            // forever (urllib3's read timeout has no direct equivalent on
            // ofInputStream). The watchdog closes the stream once no chunk
            // has arrived for a full timeout window — an IDLE deadline,
            // like urllib3's per-read timeout, so a slow-but-progressing
            // stream is never killed — turning a genuine stall into an
            // IOException → retry.
            val attemptStart = System.nanoTime()
            val lastProgress =
              new java.util.concurrent.atomic.AtomicLong(attemptStart)
            val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
            val checkMillis = math.max(50L, timeout.toMillis / 10)
            val guard = HttpFetcher.watchdog.scheduleWithFixedDelay(new Runnable {
              def run(): Unit = {
                val now = System.nanoTime()
                // idle deadline (the urllib3-read-timeout analog) OR the
                // progress-proportional attempt ceiling (drip-feed
                // backstop, see above): delivered bytes buy deadline at
                // the minimum-throughput exchange rate
                val deadlineMillis = ceilingMillis +
                  bytesRead.get() * 1000L / minThroughputBytesPerSec
                if (now - lastProgress.get() >= timeout.toNanos
                    || (now - attemptStart) / 1000000L >= deadlineMillis)
                  try in.close() catch { case _: Throwable => () }
              }
            }, checkMillis, checkMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
            try {
              // Local write failures (missing directory, disk full) are
              // permanent: fail fast instead of re-downloading through the
              // whole backoff schedule only to hit the same path error.
              val out = try Files.newOutputStream(dest) catch {
                case e: IOException =>
                  throw new HttpFetcher.LocalWriteFailure(dest.toString, e)
              }
              try {
                val buf = new Array[Byte](1 << 20) // 1 MiB streaming chunks
                var n = in.read(buf)
                while (n >= 0) {
                  lastProgress.set(System.nanoTime()) // chunk arrived: reset idle clock
                  bytesRead.addAndGet(n.toLong)       // and buy ceiling credit
                  try out.write(buf, 0, n) catch {
                    case e: IOException =>
                      throw new HttpFetcher.LocalWriteFailure(dest.toString, e)
                  }
                  n = in.read(buf)
                }
              } finally out.close()
            } finally { guard.cancel(false); in.close() }
            Right(())
          } else {
            resp.body().close()
            if (retryStatuses(code)) Left(s"HTTP $code")
            else throw new HttpFetcher.NonRetryableStatus(url, code)
          }
        } catch {
          case e: HttpFetcher.NonRetryableStatus => throw e
          case e: HttpFetcher.LocalWriteFailure => throw e
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw new IOException(s"GET $url interrupted", e)
          case e: IOException => Left(e.toString)
        }
      outcome match {
        case Right(()) => done = true
        case Left(reason) =>
          attempt += 1
          if (attempt > maxRetries)
            throw new IOException(
              s"GET $url failed after $maxRetries retries: $reason")
          sleeper((backoffFactor * math.pow(2, attempt - 1) * 1000).toLong)
      }
    }
  }
}

object HttpFetcher {
  /** The reference's `status_forcelist` (etl_main.py:66). */
  val DefaultRetryStatuses: Set[Int] = Set(429, 500, 502, 503, 504)

  /** Shared daemon scheduler for body-read deadlines (one thread for the
    * process; fetches are sequential driver-side operations).
    */
  private[sources] lazy val watchdog =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "http-fetcher-watchdog")
      t.setDaemon(true)
      t
    })

  /** A status outside the retry list — fail fast, like
    * `raise_for_status` on a non-forcelisted code.
    */
  final class NonRetryableStatus(url: String, val code: Int)
    extends IOException(s"GET $url: non-retryable HTTP $code")

  /** A local filesystem failure while persisting the body — permanent;
    * retrying re-downloads only to hit the same path/disk error.
    */
  final class LocalWriteFailure(dest: String, cause: IOException)
    extends IOException(s"cannot write download to $dest", cause)
}
