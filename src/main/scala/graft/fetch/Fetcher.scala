package graft.fetch

import graft.canon.UrlCanon
import graft.model.{FetchResult, FrontierEntry}
import graft.synthweb.{SyntheticWeb, WebConfig}

/** Fetch abstraction. The engine only ever talks to this trait; a real
  * HTTP implementation (with the reference's transport settings — 30-60s
  * timeouts, connection pooling, UA rotation per apna/main.go:33-49)
  * slots in outside the sandbox. In-sandbox: [[SimulatedFetcher]] over
  * the deterministic synthetic web.
  *
  * Instances are constructed once per partition inside `mapPartitions`
  * (never serialized per-row), mirroring a per-executor HTTP client pool.
  */
trait Fetcher extends Serializable {
  def fetch(entry: FrontierEntry): FetchResult
}

/** ST4 transport limits, carried as configuration on the fetch
  * boundary. Defaults mirror the reference's HTTP client settings:
  * 30 s request timeout (60 s for olx — olx_c226/main.go:66), 10-30 s
  * TLS handshake window, 100 max idle connections, 30 s keep-alive
  * (apna/main.go:33-45; olx_c226/main.go:65-77). A real HTTP fetcher
  * consumes these verbatim when constructing its per-partition client;
  * [[SimulatedFetcher]] has no network to apply them to.
  */
final case class TransportConfig(
    requestTimeoutSec: Int = 30, // apna/main.go:44 (olx: 60)
    tlsHandshakeTimeoutSec: Int = 10, // apna/main.go:42 (olx: 30)
    maxIdleConns: Int = 100, // apna/main.go:38
    keepAliveSec: Int = 30, // apna/main.go:36
    userAgents: Seq[String] = TransportConfig.defaultUserAgents,
    // ST7 session state: cookies/headers attached to every request of a
    // credentialed fetch (the reference pins a session cookie string on
    // its phone-API client, olx_c226/phone.go:63,90-93)
    cookies: Map[String, String] = Map.empty,
    headers: Map[String, String] = Map.empty)

object TransportConfig {
  /** Deterministic UA table for [[graft.ops.Extract.ua_pick]] rotation
    * (ST5; replayable, unlike the reference's RNG pick).
    */
  val defaultUserAgents: Seq[String] = Seq(
    "graft-crawler/1.0 (+https://graft.test/bot)",
    "graft-crawler/1.0 (+https://graft.test/bot; fetch-pool-b)",
    "graft-crawler/1.0 (+https://graft.test/bot; fetch-pool-c)")
}

/** Deterministic fetcher over [[graft.synthweb.SyntheticWeb]].
  *
  * @param simulateLatency when true, sleeps the page's seeded latency —
  *        used by the throughput bench so the fetch stage is I/O-bound
  *        like a real crawl; tests leave it off.
  *
  * Retryable-5xx semantics: a 503 page succeeds once
  * `attempt > retryableUntilAttempt` — i.e. on the first retry with the
  * synthetic web's default of 0 (reference retry policy: retry all
  * errors except 404, olx_c226/main.go:188-193).
  */
final case class SimulatedFetcher(cfg: WebConfig, simulateLatency: Boolean = false)
    extends Fetcher {

  override def fetch(entry: FrontierEntry): FetchResult = {
    // the retryable-503 upgrade lives in SyntheticWeb.serve — ONE
    // definition shared with SynthWebServer, so the two transports
    // cannot drift (RealTransportSpec pins their bit-parity)
    val (status, body, latencyMs) =
      SyntheticWeb.serve(cfg, entry.url, entry.attempt)
    if (simulateLatency && latencyMs > 0) Thread.sleep(latencyMs.toLong)
    FetchResult(
      url = entry.url,
      url_hash = entry.url_hash,
      host = entry.host,
      status = status,
      body = body,
      latency_ms = latencyMs,
      attempt = entry.attempt,
      priority = entry.priority,
      discovery_time = entry.discovery_time
    )
  }
}

/** Executor-side fetcher construction. The scheduler builds fetchers
  * INSIDE `mapPartitions` (one per partition, like a per-executor HTTP
  * client pool), so what ships through the closure is this small
  * factory, never a live client. [[SimulatedFetcherFactory]] is the
  * default (deterministic synthetic web, no sockets);
  * [[HttpFetcherFactory]] swaps in real HTTP transport against a
  * [[graft.synthweb.SynthWebServer]] loopback gateway — same crawl,
  * bit-equal fetch logs (RealTransportSpec pins the parity).
  */
trait FetcherFactory extends Serializable {
  def create(web: WebConfig, simulateLatency: Boolean): Fetcher
}

case object SimulatedFetcherFactory extends FetcherFactory {
  override def create(web: WebConfig, simulateLatency: Boolean): Fetcher =
    SimulatedFetcher(web, simulateLatency)
}

/** Real-transport factory: the crawl's fetch stages talk HTTP to
  * `baseUrl` (a loopback [[graft.synthweb.SynthWebServer]] in-sandbox;
  * any origin-mapping proxy outside it). The synthetic `web` config is
  * unused by the client — page content comes over the wire.
  */
final case class HttpFetcherFactory(baseUrl: String,
                                    transport: TransportConfig =
                                      TransportConfig())
    extends FetcherFactory {
  override def create(web: WebConfig, simulateLatency: Boolean): Fetcher =
    HttpFetcher(baseUrl, transport)
}

/** ST4 made real: a `java.net.http.HttpClient` fetcher that consumes
  * [[TransportConfig]] verbatim — request timeout (apna/main.go:44,
  * olx_c226/main.go:66) as the per-request `timeout`, the TLS/connect
  * window (apna/main.go:42) as the client's `connectTimeout`, session
  * cookies/headers (ST7, olx_c226/phone.go:90-93) on every request, and
  * ST5's deterministic UA rotation (the same `xxhash64(url) % table`
  * pick as [[graft.ops.Extract.ua_pick]], via Spark's own XXH64) in the
  * `User-Agent` header. Connection reuse/keep-alive is the JDK pool's
  * (`maxIdleConns`/`keepAliveSec` document the reference's intent —
  * apna/main.go:36-38 — the JDK client manages its pool internally).
  *
  * Transport failures (timeout, refused connection, reset) surface as
  * status 599 — a retryable non-404 under the scheduler's
  * retry-unless-404 policy (olx_c226/main.go:188-193), exactly like a
  * synthetic 503. The retry counter rides the `X-Graft-Attempt` header
  * so the deterministic origin can apply its retryable-503 upgrade.
  *
  * One client per partition (built lazily on first use after
  * deserialization), mirroring a per-executor connection pool.
  */
final case class HttpFetcher(baseUrl: String,
                             transport: TransportConfig = TransportConfig())
    extends Fetcher {

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(
        java.time.Duration.ofSeconds(transport.tlsHandshakeTimeoutSec.toLong))
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
      .build()

  private def uaOf(url: String): String = {
    val uas = transport.userAgents
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUTF8String(org.apache.spark.unsafe.types.UTF8String.fromString(url),
                      42L)
    uas(java.lang.Math.floorMod(h, uas.size.toLong).toInt)
  }

  override def fetch(entry: FrontierEntry): FetchResult = {
    val physical = baseUrl + "/" + entry.url.replaceFirst("^https?://", "")
    val t0 = System.nanoTime()
    val (status, body) =
      try {
        val b = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(physical))
          .timeout(
            java.time.Duration.ofSeconds(transport.requestTimeoutSec.toLong))
          .header("User-Agent", uaOf(entry.url))
          .header("X-Graft-Attempt", entry.attempt.toString)
        if (transport.cookies.nonEmpty)
          b.header("Cookie",
                   transport.cookies.map { case (k, v) => s"$k=$v" }
                     .mkString("; "))
        transport.headers.foreach { case (k, v) => b.header(k, v) }
        val r = client.send(
          b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString(
            java.nio.charset.StandardCharsets.UTF_8))
        (r.statusCode(), r.body())
      } catch {
        // timeout/refused/reset — and the IllegalArgumentException a
        // malformed URL raises in URI.create: an unfetchable URL is a
        // transport failure for THIS url (→ retry-unless-404 path), not
        // a job-aborting task error. Thread interrupts (task kill)
        // still propagate.
        case _: java.io.IOException      => (599, "")
        case _: IllegalArgumentException => (599, "")
      }
    FetchResult(
      url = entry.url,
      url_hash = entry.url_hash,
      host = entry.host,
      status = status,
      body = body,
      latency_ms = ((System.nanoTime() - t0) / 1000000L).toInt,
      attempt = entry.attempt,
      priority = entry.priority,
      discovery_time = entry.discovery_time
    )
  }
}

/** ST7 credentialed enrichment client (olx_c226/phone.go:53-93): one
  * instance per partition inside `mapPartitions`, session cookies from
  * [[TransportConfig]] attached to every request. [[phone]] surfaces
  * the raw (status, body); [[phoneOrFail]] mirrors the reference's
  * panic-on-401 — an expired/invalid session is a configuration error
  * that must fail the job loudly, not produce silent empty enrichment.
  */
final case class AuthedApiClient(cfg: WebConfig, transport: TransportConfig)
    extends Serializable {
  def phone(userId: String): (Int, String) = {
    val p = SyntheticWeb.phoneApiPage(cfg, userId, transport.cookies)
    (p.status, p.body)
  }
  def phoneOrFail(userId: String): String = {
    val (status, body) = phone(userId)
    if (status == 401)
      throw new IllegalStateException(
        s"phone API unauthorized for user $userId — session cookie invalid")
    body
  }
}

object Fetcher {
  /** Build a canonical frontier entry from a raw URL. */
  def entryOf(raw: String, priority: Int, discoveryTime: Long, attempt: Int,
              round: Int, salts: Int): FrontierEntry = {
    val canon = UrlCanon.canonicalize(raw)
    val hash = UrlCanon.urlHash(canon)
    val host = UrlCanon.hostOf(canon)
    FrontierEntry(
      url = canon,
      url_hash = hash,
      host = host,
      host_hash = UrlCanon.hostHash(host),
      salt = UrlCanon.saltOf(hash, salts),
      priority = priority,
      discovery_time = discoveryTime,
      attempt = attempt,
      round = round
    )
  }
}
