package graft.synthweb

import graft.canon.UrlCanon

/** Deterministic synthetic web: a pure function URL -> page.
  *
  * Stands in for the live job boards the reference scrapes (no network
  * egress in the sandbox). Content, status codes and latency all derive
  * from splitmix64 hashes of (seed, url), so any process — a Spark
  * executor, the sequential oracle, a resumed run — sees the identical
  * web with zero shared state. That property is what makes the crawl
  * deterministic and the 10^10-frontier design testable: the web needs
  * no materialization at any scale.
  *
  * Page-shape analogues (structure only, synthetic content):
  *   - listing pages with detail links + next-page cursor
  *     (indeed/main.go:66-70 link-walk; olx_c226/main.go:183-184 cursor)
  *   - detail pages with `script id="__NEXT_DATA__"` JSON payloads
  *     (apna/main.go:52-58) and interleaved text/img/video elements
  *   - slug-iid-<id> detail URL scheme (olx_c226/main.go:176-179)
  *   - robots.txt with Disallow prefixes (temoto/robotstxt, go.mod:19)
  *   - 404 vs retryable-5xx mix (olx_c226/main.go:188-193 retry policy)
  */
final case class WebConfig(
    seed: Long = 42L,
    nHosts: Int = 5,
    listPagesPerHost: Int = 4,
    detailsPerList: Int = 8,
    hotHostFactor: Int = 1, // host-0 listing-page multiplier (skew knob)
    pct404: Int = 3, // percent of detail pages that 404
    pct503: Int = 5, // percent of detail pages that 503 once, then succeed
    crossHostLinkPct: Int = 10, // percent of details linking to another host
    robotsHostsPct: Int = 60, // percent of hosts with a Disallow: /private/ rule
    latencyBaseMs: Int = 1,
    latencyJitterMs: Int = 4,
    paginationFanout: Int = 1, // listing k links to pages k+1..k+fanout
    seedAllListPages: Boolean = false, // seed every listing page directly
    pctRobots503: Int = 0 // percent of robots.txt that 503 once first
) {
  def host(h: Int): String = s"host-$h.test"
  def listPages(h: Int): Int =
    if (h == 0) listPagesPerHost * hotHostFactor else listPagesPerHost
  def seedUrls: Seq[String] =
    if (seedAllListPages)
      (0 until nHosts).flatMap(h =>
        (0 until listPages(h)).map(k => s"https://${host(h)}/list/$k"))
    else (0 until nHosts).map(h => s"https://${host(h)}/list/0")
  def totalListPages: Long = (0 until nHosts).map(listPages(_).toLong).sum
}

final case class Page(status: Int, body: String, latencyMs: Int,
                      retryableUntilAttempt: Int)

object SyntheticWeb {
  // splitmix64 — public-domain mixing function
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def hashOf(seed: Long, s: String): Long = {
    var h = seed
    var i = 0
    while (i < s.length) { h = mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  private val vocab: Array[String] =
    ("warehouse operator admin finance marketing driver engineer teacher nurse " +
      "cashier analyst designer developer chef barista security cleaner tailor " +
      "welder mechanic clerk supervisor manager assistant intern senior junior " +
      "staff lead remote onsite hybrid fulltime parttime contract jakarta bandung " +
      "surabaya medan bali").split(" ")

  private def words(rng: Long, n: Int): String = {
    val sb = new StringBuilder
    var h = rng
    var i = 0
    while (i < n) {
      h = mix64(h)
      if (i > 0) sb.append(' ')
      sb.append(vocab(((h % vocab.length) + vocab.length).toInt % vocab.length))
      i += 1
    }
    sb.toString
  }

  def detailId(cfg: WebConfig, h: Int, k: Int, i: Int): Long =
    math.abs(mix64(hashOf(cfg.seed, s"id/$h/$k/$i"))) % 100000000L

  def detailUrl(cfg: WebConfig, h: Int, k: Int, i: Int): String = {
    val id = detailId(cfg, h, k, i)
    val slug = words(hashOf(cfg.seed, s"slug/$h/$k/$i"), 3).replace(' ', '-')
    s"https://${cfg.host(h)}/item/$slug-iid-$id"
  }

  def hostHasRobots(cfg: WebConfig, h: Int): Boolean =
    pct(hashOf(cfg.seed, s"robots/$h")) < cfg.robotsHostsPct

  private def pct(h: Long): Int = (math.abs(h) % 100L).toInt

  /** Kind of a URL in this web: robots | listing | detail | other. */
  def kindOf(url: String): String = {
    if (url.endsWith("/robots.txt")) "robots"
    else if (url.contains("/list/")) "listing"
    else if (url.contains("/item/")) "detail"
    else "other"
  }

  /** Frontier priority by page kind: robots first, then listings (they
    * fan out), then details. Matches the reference's implicit ordering
    * (listing loops drive detail visits, apna/main.go:101-103,170-175).
    */
  def priorityOf(url: String): Int = kindOf(url) match {
    case "robots"  => 0
    case "listing" => 1
    case _         => 2
  }

  /** The post-retry-upgrade response a fetch of `url` at `attempt`
    * receives — the SINGLE definition of the retryable-503 upgrade,
    * shared by both transports ([[graft.fetch.SimulatedFetcher]] and
    * [[SynthWebServer]]) so the bit-parity invariant the crawl specs
    * pin cannot drift between them. Returns (status, body, latencyMs).
    */
  def serve(cfg: WebConfig, url: String, attempt: Int): (Int, String, Int) = {
    val p = page(cfg, url)
    if (p.status == 503 && attempt > p.retryableUntilAttempt)
      // the retried fetch now sees real content
      (200, page(cfg.copy(pct503 = 0, pct404 = 0), url).body, p.latencyMs)
    else (p.status, p.body, p.latencyMs)
  }

  /** The pure page function. Unknown URLs (including /private/) 404. */
  def page(cfg: WebConfig, url: String): Page = {
    val canon = UrlCanon.canonicalize(url)
    val host = UrlCanon.hostOf(canon)
    val h = hostIndex(cfg, host)
    val rng = hashOf(cfg.seed, canon)
    val latency =
      cfg.latencyBaseMs + (math.abs(mix64(rng ^ 7L)) % (cfg.latencyJitterMs.max(1))).toInt
    if (h < 0) return Page(404, "", latency, 0)

    kindOf(canon) match {
      case "robots" =>
        val body =
          if (hostHasRobots(cfg, h)) "User-agent: *\nDisallow: /private/\n"
          else "User-agent: *\nDisallow:\n"
        if (pct(mix64(rng ^ 17L)) < cfg.pctRobots503)
          Page(503, body, latency, retryableUntilAttempt = 0)
        else Page(200, body, latency, 0)

      case "listing" =>
        val k = canon.substring(canon.lastIndexOf('/') + 1).toIntOption.getOrElse(-1)
        if (k < 0 || k >= cfg.listPages(h)) Page(404, "", latency, 0)
        else Page(200, listingBody(cfg, h, k), latency, 0)

      case "detail" =>
        if (!knownDetail(cfg, h, canon)) Page(404, "", latency, 0)
        else {
          val p = pct(mix64(rng ^ 13L))
          if (p < cfg.pct404) Page(404, "", latency, 0)
          else if (p < cfg.pct404 + cfg.pct503)
            Page(503, "", latency, retryableUntilAttempt = 0)
          else Page(200, detailBody(cfg, h, canon, rng), latency, 0)
        }

      case _ => Page(404, "", latency, 0)
    }
  }

  /** The session token the credentialed phone API accepts — a pure
    * function of the web seed (the synthetic stand-in for the
    * reference's hardcoded session cookie, olx_c226/phone.go:63).
    */
  def authToken(cfg: WebConfig): String =
    f"tok-${math.abs(hashOf(cfg.seed, "auth-session-token"))}%016x"

  /** Deterministic phone number the credentialed API returns per user. */
  def phoneOf(cfg: WebConfig, userId: String): String =
    f"+62-${math.abs(hashOf(cfg.seed ^ 0xae1L, userId)) % 1000000000L}%09d"

  /** ST7 credentialed endpoint (olx_c226/phone.go:53-93): GET with a
    * session cookie. Without a valid `t` cookie the API answers 401
    * (the reference panics on that status); with it, a JSON body whose
    * `data.phone` carries the enrichment value. Pure function of
    * (seed, userId, cookies) like every other page in this web.
    */
  def phoneApiPage(cfg: WebConfig, userId: String,
                   cookies: Map[String, String]): Page = {
    val latency =
      cfg.latencyBaseMs +
        (math.abs(mix64(hashOf(cfg.seed, s"phone/$userId") ^ 7L)) %
          cfg.latencyJitterMs.max(1)).toInt
    if (!cookies.get("t").contains(authToken(cfg)))
      Page(401, """{"error":"unauthorized"}""", latency, 0)
    else
      Page(200,
           s"""{"data":{"id":"$userId","phone":"${phoneOf(cfg, userId)}"}}""",
           latency, 0)
  }

  def hostIndex(cfg: WebConfig, host: String): Int = {
    if (!host.startsWith("host-") || !host.endsWith(".test")) return -1
    host.stripPrefix("host-").stripSuffix(".test").toIntOption match {
      case Some(h) if h >= 0 && h < cfg.nHosts => h
      case _                                   => -1
    }
  }

  /** A detail URL is "known" iff it equals the generated URL for some
    * (k, i) — we verify by re-deriving from the embedded id. To keep this
    * O(1) we accept any /item/ URL whose trailing id matches the id
    * derived from one of the (k,i) slots hinted in the slug hash; in
    * practice crawlers only see URLs emitted by listingBody, so a direct
    * membership check on the id space suffices.
    */
  private def knownDetail(cfg: WebConfig, h: Int, canon: String): Boolean = {
    val idStr = canon.substring(canon.lastIndexOf('-') + 1)
    idStr.toLongOption.exists(_ >= 0) && canon.contains("-iid-")
  }

  def listingBody(cfg: WebConfig, h: Int, k: Int): String = {
    val sb = new StringBuilder
    sb.append(s"<html><body><h1>${words(hashOf(cfg.seed, s"lh/$h/$k"), 4)}</h1>\n")
    sb.append(s"<p>${words(hashOf(cfg.seed, s"lp/$h/$k"), 8)}</p>\n")
    var i = 0
    while (i < cfg.detailsPerList) {
      // ~12% of links re-point at the previous page's slot i (duplicate
      // discovery across pages → exercises the seen-set dedup)
      val dup = k > 0 && pct(hashOf(cfg.seed, s"dup/$h/$k/$i")) < 12
      val u = if (dup) detailUrl(cfg, h, k - 1, i) else detailUrl(cfg, h, k, i)
      sb.append(s"""<a href="$u">${words(hashOf(cfg.seed, s"at/$h/$k/$i"), 3)}</a>\n""")
      i += 1
    }
    if (hostHasRobots(cfg, h) && k % 2 == 0)
      sb.append(s"""<a href="/private/vault-$k">do not crawl</a>\n""")
    var np = k + 1
    while (np <= k + cfg.paginationFanout && np < cfg.listPages(h)) {
      sb.append(s"""<a href="/list/$np">page $np</a>\n""")
      np += 1
    }
    sb.append(s"""<img src="/media/list-$h-$k.jpg" alt="banner">\n""")
    sb.append("</body></html>")
    sb.toString
  }

  def detailBody(cfg: WebConfig, h: Int, canon: String, rng: Long): String = {
    val id = canon.substring(canon.lastIndexOf('-') + 1)
    val title = words(mix64(rng ^ 1L), 4)
    val company = words(mix64(rng ^ 2L), 2)
    val salaryMin = 1000000L + math.abs(mix64(rng ^ 3L)) % 9000000L
    val salaryMax = salaryMin + math.abs(mix64(rng ^ 4L)) % 3000000L
    val postedMs = 1700000000000L + math.abs(mix64(rng ^ 5L)) % 31536000000L
    val nParas = 2 + (math.abs(mix64(rng ^ 6L)) % 3L).toInt
    val sb = new StringBuilder
    sb.append(s"<html><body><h1>$title</h1>\n")
    var p = 0
    while (p < nParas) {
      sb.append(s"<p>${words(mix64(rng ^ (100L + p)), 12)}</p>\n")
      if (p == 0)
        sb.append(s"""<img src="/media/img-$id-$p.jpg" alt="${words(mix64(rng ^ 50L), 2)}">\n""")
      p += 1
    }
    if (math.abs(mix64(rng ^ 8L)) % 100 < 30)
      sb.append(s"""<video src="/media/vid-$id.mp4"></video>\n""")
    if (pct(mix64(rng ^ 9L)) < cfg.crossHostLinkPct && cfg.nHosts > 1) {
      val oh = ((h + 1 + (math.abs(mix64(rng ^ 10L)) % (cfg.nHosts - 1)).toInt) % cfg.nHosts)
      sb.append(s"""<a href="https://${cfg.host(oh)}/list/0">related on ${cfg.host(oh)}</a>\n""")
    }
    sb.append(
      s"""<script id="__NEXT_DATA__" type="application/json">{"props":{"pageProps":{"job":{""" +
        s""""id":$id,"title":"$title","organization":{"name":"$company"},""" +
        s""""min_salary":$salaryMin,"max_salary":$salaryMax,"posted_ms":$postedMs}}}}</script>\n""")
    sb.append("</body></html>")
    sb.toString
  }
}
