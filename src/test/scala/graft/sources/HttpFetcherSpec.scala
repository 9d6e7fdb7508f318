package graft.sources

import java.io.IOException
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** Retry/backoff/streaming semantics of [[HttpFetcher]] against a local
  * flaky server, plus the end-to-end LandingZone integration (cache +
  * atomic move + backup around a real HTTP fetch).
  */
class HttpFetcherSpec extends AnyFunSuite {

  private def withServer(handler: (Int, com.sun.net.httpserver.HttpExchange) => Unit)
      (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // concurrent handling: a handler deliberately stalling one exchange
    // (idle-watchdog tests) must not block the retry's fresh request
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    val hits = new AtomicInteger(0)
    server.createContext("/data", ex => {
      handler(hits.incrementAndGet(), ex)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/data")
    finally server.stop(0)
  }

  private def ok(ex: com.sun.net.httpserver.HttpExchange, payload: String): Unit = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def err(ex: com.sun.net.httpserver.HttpExchange, code: Int): Unit =
    ex.sendResponseHeaders(code, -1)

  private def tmpFile(): Path = {
    val p = Files.createTempFile("fetch", ".csv")
    Files.delete(p)
    p
  }

  test("retries through 503s with the urllib3 backoff schedule, then succeeds") {
    withServer((n, ex) => if (n <= 2) err(ex, 503) else ok(ex, "a,b\n1,2\n")) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dest = tmpFile()
      new HttpFetcher(url, sleeper = sleeps.append(_))(dest)
      assert(Files.readString(dest) == "a,b\n1,2\n")
      // backoff_factor 0.5: 0.5 * 2^0, 0.5 * 2^1 seconds
      assert(sleeps.toSeq == Seq(500L, 1000L))
    }
  }

  test("404 fails immediately with no retries") {
    withServer((_, ex) => err(ex, 404)) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val e = intercept[HttpFetcher.NonRetryableStatus] {
        new HttpFetcher(url, sleeper = sleeps.append(_))(tmpFile())
      }
      assert(e.code == 404)
      assert(sleeps.isEmpty)
    }
  }

  test("gives up after maxRetries on a persistent 500") {
    withServer((_, ex) => err(ex, 500)) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val e = intercept[IOException] {
        new HttpFetcher(url, maxRetries = 3, sleeper = sleeps.append(_))(tmpFile())
      }
      assert(e.getMessage.contains("failed after 3 retries"))
      assert(e.getMessage.contains("HTTP 500"))
      assert(sleeps.toSeq == Seq(500L, 1000L, 2000L))
    }
  }

  test("mid-body connection errors retry like 5xx (truncated stream)") {
    // Server declares 1000 bytes but closes after 10: the client hits an
    // IOException inside the streaming copy, which must retry (the fetcher
    // rewrites dest from scratch, so the truncated attempt leaves nothing).
    withServer((n, ex) =>
      if (n == 1) {
        ex.sendResponseHeaders(200, 1000)
        ex.getResponseBody.write("truncated!".getBytes(StandardCharsets.UTF_8))
      } else ok(ex, "complete payload")) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dest = tmpFile()
      new HttpFetcher(url, sleeper = sleeps.append(_))(dest)
      assert(Files.readString(dest) == "complete payload")
      assert(sleeps.size == 1)
    }
  }

  test("a stalled body stream is killed by the idle watchdog and retried") {
    // First attempt: headers + a few bytes, then the handler hangs well past
    // the idle deadline without closing. The watchdog must close the stream
    // (IOException → retryable), and the second attempt completes.
    withServer((n, ex) =>
      if (n == 1) {
        ex.sendResponseHeaders(200, 1000)
        ex.getResponseBody.write("stall".getBytes(StandardCharsets.UTF_8))
        ex.getResponseBody.flush()
        Thread.sleep(3000)
      } else ok(ex, "after stall")) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dest = tmpFile()
      new HttpFetcher(url, timeout = java.time.Duration.ofMillis(500),
        sleeper = sleeps.append(_))(dest)
      assert(Files.readString(dest) == "after stall")
      assert(sleeps.size == 1)
    }
  }

  test("a drip-feeding stream cannot defeat the idle watchdog: the attempt ceiling kills it") {
    // One byte per 100 ms keeps resetting the 300 ms idle clock forever;
    // the 900 ms whole-attempt ceiling must end the attempt anyway, and
    // the retry (handler n >= 2) completes normally.
    withServer((n, ex) =>
      if (n == 1) {
        ex.sendResponseHeaders(200, 1000)
        (1 to 40).foreach { _ =>
          ex.getResponseBody.write('x')
          ex.getResponseBody.flush()
          Thread.sleep(100)
        }
      } else ok(ex, "after drip")) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dest = tmpFile()
      new HttpFetcher(url, timeout = java.time.Duration.ofMillis(300),
        attemptCeiling = Some(java.time.Duration.ofMillis(900)),
        sleeper = sleeps.append(_))(dest)
      assert(Files.readString(dest) == "after drip")
      assert(sleeps.size == 1)
    }
  }

  test("delivered bytes extend the attempt ceiling: a stream above the throughput floor survives it") {
    // 6 x 10-byte chunks every 150 ms (~900 ms body) against a 300 ms base
    // ceiling: at 20 B/s floor the first chunks already buy seconds of
    // deadline credit, so the healthy-but-slow stream must never be killed
    // — the drip-feed backstop only fires when average throughput is under
    // the floor (the fixed-cap regression killed any download longer than
    // the ceiling regardless of progress).
    withServer((_, ex) => {
      val chunk = "0123456789".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, chunk.length * 6L)
      (1 to 6).foreach { _ =>
        ex.getResponseBody.write(chunk)
        ex.getResponseBody.flush()
        Thread.sleep(150)
      }
    }) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dest = tmpFile()
      // idle budget 2 s >> the 150 ms chunk cadence: the assertion is
      // about the CEILING stretching, and a CI scheduling pause must not
      // flake it through the idle path instead
      new HttpFetcher(url, timeout = java.time.Duration.ofSeconds(2),
        attemptCeiling = Some(java.time.Duration.ofMillis(300)),
        minThroughputBytesPerSec = 20L,
        sleeper = sleeps.append(_))(dest)
      assert(Files.readString(dest) == "0123456789" * 6)
      assert(sleeps.isEmpty) // zero retries: the ceiling stretched with progress
    }
  }

  test("a slow but progressing stream outlives the per-attempt deadline") {
    // 6 chunks, 150 ms apart = ~900 ms total body time with a 500 ms idle
    // budget: a fixed whole-body deadline would kill this healthy download
    // on every attempt (the ADVICE regression); the idle watchdog must not.
    withServer((_, ex) => {
      val chunk = "0123456789".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, chunk.length * 6L)
      (1 to 6).foreach { _ =>
        ex.getResponseBody.write(chunk)
        ex.getResponseBody.flush()
        Thread.sleep(150)
      }
    }) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val dest = tmpFile()
      // 2 s idle budget vs 150 ms cadence: wide margin so a CI scheduling
      // pause can't fire the watchdog on a genuinely healthy stream
      new HttpFetcher(url, timeout = java.time.Duration.ofSeconds(2),
        sleeper = sleeps.append(_))(dest)
      assert(Files.readString(dest) == "0123456789" * 6)
      assert(sleeps.isEmpty) // zero retries: the stream was never killed
    }
  }

  test("local write failures fail fast without burning the retry budget") {
    withServer((_, ex) => ok(ex, "data")) { url =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val badDest = java.nio.file.Paths.get(
        Files.createTempDirectory("nope").toString, "missing", "sub", "f.csv")
      val e = intercept[HttpFetcher.LocalWriteFailure] {
        new HttpFetcher(url, sleeper = sleeps.append(_))(badDest)
      }
      assert(e.getMessage.contains("cannot write download"))
      assert(sleeps.isEmpty) // no retries for a permanent local path error
    }
  }

  test("LandingZone + HttpFetcher: fetch, cache within TTL, force refetch, backup") {
    val hits = new AtomicInteger(0)
    withServer((n, ex) => { hits.set(n); ok(ex, s"payload-$n") }) { url =>
      val dir = Files.createTempDirectory("landing").toString
      val zone = new Sinks.LandingZone(dir)
      val fetcher = new HttpFetcher(url, sleeper = _ => ())
      val p1 = zone.fetch(fetcher)
      assert(Files.readString(p1) == "payload-1")
      // within TTL: cache hit, no second request
      zone.fetch(fetcher)
      assert(hits.get() == 1)
      // force: refetches and atomically replaces
      val p3 = zone.fetch(fetcher, force = true)
      assert(Files.readString(p3) == "payload-2")
      // every successful fetch leaves a timestamped backup (stream closed:
      // Files.list holds a directory handle until closed, not GC'd)
      val listing = Files.list(java.nio.file.Paths.get(dir, "backups"))
      val backups = try listing.count() finally listing.close()
      assert(backups >= 1)
    }
  }
}
