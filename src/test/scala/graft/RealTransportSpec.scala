package graft

import org.apache.spark.sql.functions.col

import graft.fetch.{Fetcher, HttpFetcher, SimulatedFetcher, TransportConfig}
import graft.synthweb.{SyntheticWeb, SynthWebServer, WebConfig}

/** ST4 made real: [[HttpFetcher]] over a loopback [[SynthWebServer]]
  * must be semantically indistinguishable from [[SimulatedFetcher]] —
  * same status, same body, same retry upgrade — while actually applying
  * the transport limits (request timeout) and actually putting the ST5
  * UA rotation / ST7 session cookies on the wire.
  */
class RealTransportSpec extends SparkSuite {

  private val web = WebConfig(seed = 77, nHosts = 3, listPagesPerHost = 2,
                              detailsPerList = 4, pct404 = 20, pct503 = 0,
                              crossHostLinkPct = 10)

  private def entry(url: String, attempt: Int = 0) =
    Fetcher.entryOf(url, SyntheticWeb.priorityOf(url), 0L, attempt, 0, 8)

  private def withServer[A](cfg: WebConfig)(f: SynthWebServer => A): A = {
    val server = new SynthWebServer(cfg, slowMs = 2500L)
    try f(server)
    finally server.stop()
  }

  test("http fetch equals simulated fetch across page kinds") {
    withServer(web) { server =>
      val http = HttpFetcher(server.baseUrl)
      val sim = SimulatedFetcher(web)
      val urls = Seq(
        "https://host-0.test/robots.txt",
        "https://host-0.test/list/0",
        "https://host-1.test/list/1",
        SyntheticWeb.detailUrl(web, 0, 0, 1),
        SyntheticWeb.detailUrl(web, 1, 1, 2),
        SyntheticWeb.detailUrl(web, 2, 0, 3),
        "https://host-0.test/list/99", // out-of-range listing: 404
        "https://host-9.test/list/0", // unknown host: 404
        "https://host-0.test/private/x" // robots-disallowed target: 404
      )
      urls.foreach { u =>
        val (h, s) = (http.fetch(entry(u)), sim.fetch(entry(u)))
        assert(h.status == s.status, s"status diverges on $u")
        assert(h.body == s.body, s"body diverges on $u")
        assert(h.url == s.url && h.url_hash == s.url_hash && h.host == s.host)
      }
    }
  }

  test("retryable 503 upgrades on retry, over the wire") {
    val w503 = web.copy(pct404 = 0, pct503 = 100)
    withServer(w503) { server =>
      val http = HttpFetcher(server.baseUrl)
      val sim = SimulatedFetcher(w503)
      val u = SyntheticWeb.detailUrl(w503, 0, 0, 1)
      // first attempt: 503 with empty body, both transports
      assert(http.fetch(entry(u, attempt = 0)).status == 503)
      assert(sim.fetch(entry(u, attempt = 0)).status == 503)
      // retry: the X-Graft-Attempt header drives the server's upgrade —
      // both transports now see the real content
      val (h1, s1) = (http.fetch(entry(u, attempt = 1)),
                      sim.fetch(entry(u, attempt = 1)))
      assert(h1.status == 200 && s1.status == 200)
      assert(h1.body == s1.body && h1.body.nonEmpty)
    }
  }

  test("request timeout limit is enforced (599, retryable)") {
    withServer(web) { server =>
      val http = HttpFetcher(server.baseUrl,
                             TransportConfig(requestTimeoutSec = 1))
      val t0 = System.nanoTime()
      val r = http.fetch(entry("https://__slow__/page"))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(r.status == 599) // transport failure: retryable non-404
      assert(r.body.isEmpty)
      assert(elapsedMs < 2500L, s"timeout did not cut the request: $elapsedMs ms")
    }
  }

  test("a malformed URL is a 599 transport failure, not a task-killing throw") {
    withServer(web) { server =>
      val http = HttpFetcher(server.baseUrl)
      // the space makes URI.create throw IllegalArgumentException; the
      // fetch must absorb it into the retryable-599 path (a bad URL in
      // a 100 TB frontier must never abort the stage)
      val r = http.fetch(entry("https://host-0.test/bad path"))
      assert(r.status == 599)
      assert(r.body.isEmpty)
    }
  }

  test("percent-encoded URLs map to the same logical page on both transports") {
    withServer(web) { server =>
      val http = HttpFetcher(server.baseUrl)
      val sim = SimulatedFetcher(web)
      // %2F must NOT be decoded into a path separator server-side: the
      // raw path is the logical identity (an unknown page on both
      // transports — but the same unknown page, hence the same 404)
      val url = "https://host-0.test/a%2Fb"
      val h = http.fetch(entry(url))
      val s = sim.fetch(entry(url))
      assert(h.status == s.status && h.body == s.body)
    }
  }

  test("deterministic UA rotation and session cookies cross the wire") {
    import spark.implicits._
    val transport = TransportConfig(cookies = Map("t" -> "tok-abc"),
                                    headers = Map("X-Graft-Test" -> "yes"))
    withServer(web) { server =>
      val http = HttpFetcher(server.baseUrl, transport)
      val urls = (0 until 2).flatMap(h =>
        (0 until 2).map(k => s"https://host-$h.test/list/$k"))
      urls.foreach(u => http.fetch(entry(u)))
      // engine-side expectation: the SAME pick Extract.ua_pick computes
      val expected = urls.toDF("url")
        .select(col("url"),
                graft.ops.Extract.ua_pick(col("url"),
                                          transport.userAgents).as("ua"))
        .as[(String, String)].collect().toMap
      urls.foreach { u =>
        val path = "/" + u.stripPrefix("https://")
        val hdrs = server.seenHeaders.get(path)
        assert(hdrs != null, s"no request seen for $path")
        assert(hdrs("User-agent") == expected(u),
               s"UA rotation diverges from ua_pick on $u")
        assert(hdrs("Cookie") == "t=tok-abc")
        assert(hdrs("X-graft-test") == "yes")
      }
      // the rotation actually rotates across the url set
      assert(expected.values.toSet.size > 1)
    }
  }

  test("full crawl over real HTTP is bit-equal to the simulated crawl") {
    import graft.model.{Doc, FetchLogEntry, SeenEntry}
    import graft.sched.{CrawlConfig, CrawlScheduler}
    import graft.store.Snapshots
    import spark.implicits._
    // 404s, retryable 503s (detail AND robots), robots rules, cross-host
    // links — every fetch-path shape crosses the wire
    val crawlWeb = WebConfig(seed = 4242, nHosts = 3, listPagesPerHost = 2,
                             detailsPerList = 5, pct404 = 10, pct503 = 15,
                             crossHostLinkPct = 15, pctRobots503 = 50)
    def run(fetcher: graft.fetch.FetcherFactory): (Snapshots, Int) = {
      val cfg = CrawlConfig(web = crawlWeb, outDir = tmpDir("httpcrawl-"),
                            maxRounds = 40, hostCapacity = 4.0,
                            hostRefill = 4.0, fetcher = fetcher)
      val last = new CrawlScheduler(spark, cfg).run()
      (new Snapshots(cfg.outDir), last)
    }
    val (simSnaps, simLast) = run(graft.fetch.SimulatedFetcherFactory)
    withServer(crawlWeb) { server =>
      val (httpSnaps, httpLast) = run(
        graft.fetch.HttpFetcherFactory(server.baseUrl))
      assert(simLast == httpLast)
      def log(s: Snapshots, last: Int) = spark.read
        .schema(implicitly[org.apache.spark.sql.Encoder[FetchLogEntry]].schema)
        .parquet(s.fetchLogPaths(last): _*).as[FetchLogEntry].collect()
        .sortBy(e => (e.round, e.host_hash, e.seq)).toVector
      def seen(s: Snapshots, last: Int) = spark.read
        .schema(implicitly[org.apache.spark.sql.Encoder[SeenEntry]].schema)
        .parquet(s.seenPaths(s.readManifest(last)): _*).as[SeenEntry]
        .collect().map(e => e.url_hash -> e.status).toMap
      def docs(s: Snapshots, last: Int) = spark.read
        .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
        .parquet(s.docsPaths(last): _*).as[Doc].collect()
        .map(d => d.doc_id -> d).toMap
      val (sl, hl) = (log(simSnaps, simLast), log(httpSnaps, httpLast))
      assert(sl.size == hl.size, s"fetch count: sim ${sl.size} http ${hl.size}")
      sl.zip(hl).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"fetch log diverges at $i: sim $a http $b")
      }
      assert(sl.nonEmpty && sl.exists(_.status != 200)) // non-vacuous
      assert(seen(simSnaps, simLast) == seen(httpSnaps, httpLast))
      val (sd, hd) = (docs(simSnaps, simLast), docs(httpSnaps, httpLast))
      assert(sd.keySet == hd.keySet)
      sd.foreach { case (id, d) =>
        assert(d.spans == hd(id).spans, s"spans diverge on $id")
      }
    }
  }
}
