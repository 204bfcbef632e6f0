package graft

import org.apache.spark.sql.functions._

import graft.parse.CssSelect
import graft.sinks.{CsvSink, JdbcSink, ParquetSink}
import graft.sources.CursorSource

/** P5 selector engine against a topkarir-shaped fixture
  * (topkarir/main.go:43,55-79 — the selectors are the reference's own).
  */
class CssSelectSpec extends SparkSuite {
  import spark.implicits._

  private val page =
    """<html><body>
      |<div class="job-card"><div class="footer"><center>
      |  <a class="lightblue" data-url="https://t.test/detil/x-1">go</a>
      |</center></div></div>
      |<div id="detail_job">
      |  <h1 id="title-comprof"> PT Example Corp </h1>
      |  <div id="detail-comprof"><a href="https://example.test">site</a>,
      |<span>Jl. Sudirman 1</span>,<span>Konsultan IT</span></div>
      |  <div id="comp-detail"><div class="jobdesc"><div class="desc">builds things</div></div></div>
      |  <div class="detail"><div>hdr</div><div>addr one</div><div>addr two</div><div>addr three</div></div>
      |</div></body></html>""".stripMargin

  test("reference selectors: #id, descendant, attr, nth-of-type, Contents()") {
    assert(CssSelect.extractText(page, "#title-comprof") == "PT Example Corp")
    assert(CssSelect.extractAttr(page, "#detail-comprof a", "href") ==
      "https://example.test")
    assert(CssSelect.extractAttr(page, ".job-card .footer center a.lightblue",
                                 "data-url") == "https://t.test/detil/x-1")
    assert(CssSelect.extractText(page, "#comp-detail .jobdesc .desc") ==
      "builds things")
    assert(CssSelect.extractText(page, ".detail div:nth-of-type(2)") == "addr one")
    assert(CssSelect.extractText(page, ".detail div:nth-of-type(3)") == "addr two")
    assert(CssSelect.extractText(page, ".detail div:nth-of-type(4)") == "addr three")
    // goquery Contents() mixed-node positional access (main.go:61-69):
    // children of #detail-comprof = [a, text, span, text, span]
    assert(CssSelect.extractContentsText(page, "#detail-comprof", 2) ==
      "Jl. Sudirman 1")
    assert(CssSelect.extractContentsText(page, "#detail-comprof", 4) ==
      "Konsultan IT")
    // misses are empty, not null/throwing
    assert(CssSelect.extractText(page, "#nope .x") == "")
    assert(CssSelect.extractAttr(page, "#title-comprof", "href") == "")
  }

  test("column operators run codegen'd over a DataFrame") {
    val got = Seq(page).toDF("html")
      .select(CssSelect.css_text(col("html"), "#title-comprof").as("t"),
              CssSelect.css_attr(col("html"), "#detail-comprof a", "href").as("a"),
              CssSelect.css_contents_text(col("html"), "#detail-comprof", 2).as("c"))
      .as[(String, String, String)].head()
    assert(got == (("PT Example Corp", "https://example.test", "Jl. Sudirman 1")))
  }

  test("malformed input: stray close tags, unclosed elements, void tags") {
    val dom = CssSelect.parseDom(
      "<div><p>a</b><img src=\"x.jpg\"><p>b</div></span>")
    assert(CssSelect.select(dom, "img").head.attrs("src") == "x.jpg")
    assert(CssSelect.select(dom, "div p").nonEmpty)
  }

  test("fuzz: arbitrary byte soup never throws, parse is total (property)") {
    import graft.synthweb.SyntheticWeb.mix64
    // deterministic seeded fuzz (scalacheck-style, no generator dep):
    // strings biased toward HTML metacharacters and partial constructs
    val atoms = Array("<", ">", "/", "\"", "'", "=", "!", "-", "a", "div",
                      "<div", "<a href=\"x\">", "</div>", "<!--", "-->",
                      "<![CDATA[", "]]>", "<!DOCTYPE", "<?pi", " ", "txt",
                      "<script>", "</script>", "<img src='y'>", "&amp;", "\n")
    (0 until 300).foreach { trial =>
      var h = mix64(trial.toLong ^ 0xf0220L)
      val sb = new StringBuilder
      val len = 1 + (math.abs(h) % 40L).toInt
      (0 until len).foreach { _ =>
        h = mix64(h)
        sb.append(atoms(((h % atoms.length) + atoms.length).toInt % atoms.length))
      }
      val html = sb.toString
      // total: never throws, selectors always answer
      val dom = CssSelect.parseDom(html)
      CssSelect.select(dom, "div a")
      CssSelect.extractText(html, "#x .y")
      CssSelect.extractAttr(html, "a", "href")
      CssSelect.extractContentsText(html, "div", 2)
      graft.parse.HtmlSpans.parse("https://h.test/p", html)
    }
  }

  test("comments, doctype and CDATA do not corrupt the child structure") {
    val html = "<!DOCTYPE html><div id=\"x\"><a>1</a><!-- ad --><span>2</span>" +
      "<?pi data?><![CDATA[junk]]><b>3</b></div><!-- trailing"
    // positional Contents() sees exactly the element/text children —
    // comment/doctype/CDATA nodes are skipped, not treated as opens
    assert(CssSelect.extractText(html, "#x span") == "2")
    assert(CssSelect.extractText(html, "#x b") == "3")
    val kids = CssSelect.contents(
      CssSelect.select(CssSelect.parseDom(html), "#x").head)
    assert(kids.collect { case e: CssSelect.Elem => e.tag } ==
      Vector("a", "span", "b"))
  }
}

/** S5 opaque cursor chain: the next page is reachable ONLY through the
  * previous response (olx_c226/main.go:183-184).
  */
class CursorSourceSpec extends SparkSuite {

  private val pages = Map("alpha" -> 4, "beta" -> 1, "gamma" -> 7)
  private val api = CursorSource.SyntheticCursorApi(99L, pages, itemsPerPage = 3)

  test("scan drains every chain exactly; chain is the only route") {
    val got = CursorSource.scan(spark, pages.keys.toSeq.sorted, api).collect()
    // every page of every facet reached, nothing else
    assert(got.length == pages.values.sum * 3)
    pages.foreach { case (f, n) =>
      val ids = got.filter(_.facet == f).map(_.id).sorted.toSeq
      assert(ids == (0L until n * 3L), s"facet $f incomplete: $ids")
    }
    // a guessed/forged cursor yields nothing: the chain IS the route
    assert(api.fetch("https://api.test/search?facet=alpha&cursor=0000000000000001")
      .items.isEmpty)
    // parity with a sequential driver-side walk
    val seq = pages.keys.toSeq.sorted.flatMap { f =>
      Iterator.unfold(api.startUrl(f)) { url =>
        if (url.isEmpty) None
        else { val p = api.fetch(url); Some((p.items, p.next_url)) }
      }.flatten.toVector
    }.toSet
    assert(got.toSet == seq)
  }
}

/** S2 GraphQL POST paged scan: probe sizes the grid, pages distribute,
  * the last partial page is exact (kitalulus/main.go:95-151 shape).
  */
class GraphQlSourceSpec extends SparkSuite {
  import graft.sources.GraphQlSource

  private val template =
    """{"query":"q","variables":{"page":%PAGE%,"limit":%LIMIT%}}"""

  test("total probe + page grid + partial last page") {
    val api = GraphQlSource.SyntheticGqlApi(total = 23)
    val got = GraphQlSource
      .pagedScan(spark, "https://gql.test/graphql", template, limit = 5, api)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._2)
    assert(got.length == 23) // 4 full pages + a 3-item partial page
    assert(got.map(_._2).toSeq == (0L until 23L))
    got.foreach { case (page, id, title, company) =>
      assert(page == id / 5)
      assert(title == s"job-$id" && company == s"co-${id % 7}")
    }
  }

  test("body templating substitutes both variables") {
    val b = GraphQlSource.body(template, 7L, 5)
    assert(b.contains("\"page\":7") && b.contains("\"limit\":5"))
    assert(!b.contains("%PAGE%") && !b.contains("%LIMIT%"))
  }
}

/** K2 JDBC sink capability: option plumbing, the MySQL failure path
  * (that driver jar is absent by design — BASELINE.md), and a REAL
  * write+readback roundtrip against embedded Derby with concurrent
  * writer partitions (q94 runs the same pairing through the DuckDB
  * oracle gate).
  */
class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("jdbc sink roundtrips rows through embedded Derby") {
    val dir = tmpDir("derbyspec-")
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/db;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val rows = (1 to 257).map(i => (i.toLong, s"name-$i", i * 1.5, i % 7))
    val df = rows.toDF("id", "name", "bal", "grp").repartition(4)
    JdbcSink(url, "rt", "app", "app", driver = driver, batchSize = 32,
             numPartitions = 4).write(df)
    val back = spark.read.format("jdbc").option("url", url)
      .option("driver", driver).option("dbtable", "rt").load()
      .as[(Long, String, Double, Int)].collect().toSet
    assert(back == rows.toSet) // every row, every column class, exact
    // append mode appends (not replaces): a second write doubles rows
    JdbcSink(url, "rt", "app", "app", driver = driver, batchSize = 32,
             numPartitions = 2).write(df.limit(10))
    val n = spark.read.format("jdbc").option("url", url)
      .option("driver", driver).option("dbtable", "rt").load().count()
    assert(n == 267L)
  }

  test("jdbc sink carries the reference pool/batch settings") {
    val sink = JdbcSink("jdbc:mysql://db.test:3306/colly", "jobs_apna",
                        "loader", "pw")
    val o = sink.options
    assert(o("batchsize") == "128") // channel cap (apna/main.go:119)
    assert(o("numPartitions") == "10") // pool idle cap (db/mysql.go:17)
    assert(o("isolationLevel") == "READ_COMMITTED")
    assert(o("dbtable") == "jobs_apna")
    assert(o("driver") == "com.mysql.cj.jdbc.Driver")
  }

  test("jdbc write reaches the jdbc layer (fails on the absent driver)") {
    val sink = JdbcSink("jdbc:mysql://db.test:3306/colly", "t", "u", "p")
    val e = intercept[Throwable] {
      sink.write(Seq((1, "a")).toDF("id", "v"))
    }
    val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
    assert(msg.contains("com.mysql.cj.jdbc.Driver") || msg.contains("driver"),
           s"unexpected failure: $msg")
  }

  test("transport config defaults mirror the reference client settings") {
    val t = graft.fetch.TransportConfig()
    assert(t.requestTimeoutSec == 30) // apna/main.go:44
    assert(t.tlsHandshakeTimeoutSec == 10) // apna/main.go:42
    assert(t.maxIdleConns == 100) // apna/main.go:38
    assert(t.keepAliveSec == 30) // apna/main.go:36
    assert(t.userAgents.nonEmpty && t.userAgents.distinct == t.userAgents)
  }

  test("ST7 credentialed fetch: valid cookie 200s, missing/bad cookie 401s") {
    import graft.fetch.{AuthedApiClient, TransportConfig}
    import graft.synthweb.{SyntheticWeb, WebConfig}
    val web = WebConfig(seed = 321)
    val good = AuthedApiClient(web, TransportConfig(
      cookies = Map("t" -> SyntheticWeb.authToken(web))))
    val (st, body) = good.phone("42")
    assert(st == 200)
    assert(body.contains(SyntheticWeb.phoneOf(web, "42")))
    // deterministic: same user, same phone
    assert(good.phone("42") == ((st, body)))
    // no cookie jar, wrong token, and a DIFFERENT web's token all 401
    Seq(TransportConfig(),
        TransportConfig(cookies = Map("t" -> "tok-ffffffffffffffff")),
        TransportConfig(cookies =
          Map("t" -> SyntheticWeb.authToken(WebConfig(seed = 999))))
    ).foreach { t =>
      assert(AuthedApiClient(web, t).phone("42")._1 == 401)
    }
    // the reference panics on 401 (olx_c226/phone.go:90-93): the
    // fail-loud wrapper mirrors that
    val bad = AuthedApiClient(web, TransportConfig())
    val e = intercept[IllegalStateException] { bad.phoneOrFail("42") }
    assert(e.getMessage.contains("unauthorized"))
    assert(good.phoneOrFail("42").contains("phone"))
  }

  test("parquet and csv sinks round-trip") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val p = tmpDir("sink-parquet-")
    ParquetSink(p, mode = "overwrite").write(df)
    assert(spark.read.parquet(p).count() == 2)
    val c = tmpDir("sink-csv-")
    CsvSink(c, header = true, mode = "overwrite").write(df)
    assert(spark.read.option("header", "true").csv(c).count() == 2)
  }
}
