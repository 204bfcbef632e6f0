package graft.synthweb

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback HTTP gateway over the deterministic synthetic web — the
  * real-socket counterpart of [[graft.fetch.SimulatedFetcher]], so the
  * ST4 transport limits can be exercised against genuine network I/O
  * in-sandbox (no egress: the server binds 127.0.0.1 only).
  *
  * Request mapping: the gateway serves every synthetic host from one
  * port, proxy-style — `GET /host-0.test/list/0` answers the logical
  * page `https://host-0.test/list/0` (query strings pass through).
  * The retryable-503 upgrade that [[graft.fetch.SimulatedFetcher]]
  * applies from `FrontierEntry.attempt` is driven by the
  * `X-Graft-Attempt` request header, so a retried real fetch sees the
  * same recovered body a retried simulated fetch does — the crawl
  * parity spec (RealTransportSpec) holds the two transports to
  * bit-equal fetch logs.
  *
  * Paths under [[slowPrefix]] sleep [[slowMs]] before answering —
  * the fixture for the request-timeout limit (the reference's 30 s
  * client timeout, apna/main.go:44; olx_c226/main.go:66).
  */
final class SynthWebServer(cfg: WebConfig,
                           slowPrefix: String = "/__slow__",
                           slowMs: Long = 2000L,
                           threads: Int = 32) {

  /** Last request headers seen per path — lets specs assert the UA
    * rotation / cookie attachment actually crossed the wire.
    */
  val seenHeaders = new ConcurrentHashMap[String, Map[String, String]]()

  private val pool = Executors.newFixedThreadPool(threads)
  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.setExecutor(pool)
    s.createContext("/", (ex: HttpExchange) => handle(ex))
    s.start()
    s
  }

  /** `http://127.0.0.1:<port>` — prepend to a scheme-stripped logical
    * URL to get the physical one.
    */
  def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def handle(ex: HttpExchange): Unit =
    try {
      val uri = ex.getRequestURI
      val path = uri.getPath
      if (path.startsWith(slowPrefix)) {
        Thread.sleep(slowMs)
        respond(ex, 200, "slow")
      } else {
        // RAW path: the logical URL must be rebuilt byte-for-byte as
        // the client sent it — getPath percent-DECODES, so an encoded
        // sequence (/a%2Fb) would map to a different synthetic page
        // than the simulated transport hashes, breaking bit-parity
        val logical = "https://" + uri.getRawPath.stripPrefix("/") +
          Option(uri.getRawQuery).map("?" + _).getOrElse("")
        val names = ex.getRequestHeaders.keySet()
        val hdrs = names.toArray(Array.empty[String]).map { k =>
          k -> ex.getRequestHeaders.getFirst(k)
        }.toMap
        seenHeaders.put(path, hdrs)
        val attempt =
          Option(ex.getRequestHeaders.getFirst("X-graft-attempt"))
            .flatMap(_.toIntOption).getOrElse(0)
        // the retryable-503 upgrade is the shared SyntheticWeb.serve —
        // the same code path SimulatedFetcher runs, by construction
        val (status, body, _) = SyntheticWeb.serve(cfg, logical, attempt)
        respond(ex, status, body)
      }
    } catch {
      case _: InterruptedException => // pool shutdown during a slow sleep
    } finally ex.close()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1L else bytes.length.toLong)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      os.write(bytes)
      os.close()
    }
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
  }
}
