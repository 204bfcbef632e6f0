package graft

import org.apache.spark.sql.functions._

import graft.canon.UrlCanon
import graft.model.{Doc, FetchLogEntry, SeenEntry}
import graft.ops.Skew
import graft.sched.{CrawlConfig, CrawlScheduler}
import graft.store.Snapshots
import graft.synthweb.WebConfig

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on a 90%-hot-key input") {
    // 90% of rows carry key 7
    val big = spark.range(0, 20000)
      .withColumn("k", when(pmod(col("id"), lit(10)) < 9, 7L).otherwise(pmod(col("id"), lit(100))))
      .withColumn("v", col("id") * 3)
    val small = spark.range(0, 100).select(col("id").as("k"), concat(lit("dim-"), col("id")).as("name"))
    val plain = big.join(small, "k").agg(count(lit(1)), sum(col("v")), count(col("name")))
      .as[(Long, Long, Long)].head()
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .agg(count(lit(1)), sum(col("v")), count(col("name")))
      .as[(Long, Long, Long)].head()
    assert(salted == plain)
  }

  test("two-phase top-k per group equals single-window top-k") {
    val df = spark.range(0, 30000)
      .withColumn("g", when(pmod(col("id"), lit(10)) < 9, 1L).otherwise(pmod(col("id"), lit(20))))
      .withColumn("score", pmod(col("id") * 2654435761L, lit(1000000)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select("g", "id").as[(Long, Long)].collect().toSet
    val got = Skew.topKByGroup(df, "g", Seq(col("score").desc, col("id")), 5)
      .select("g", "id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("reserved scratch columns fail loud instead of corrupting output") {
    val withSalt = spark.range(0, 10)
      .select(col("id").as("k"), col("id").as("__salt"))
    val small = spark.range(0, 10).select(col("id").as("k"))
    val e1 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(withSalt, small, "k", salts = 4)
    }
    assert(e1.getMessage.contains("__salt"))
    val e2 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(small, withSalt, "k", salts = 4)
    }
    assert(e2.getMessage.contains("__salt"))
    val withR = spark.range(0, 10)
      .select(col("id").as("g"), col("id").as("__r"))
    val e3 = intercept[IllegalArgumentException] {
      Skew.topKByGroup(withR, "g", Seq(col("__r")), 3)
    }
    assert(e3.getMessage.contains("__r"))
  }
}

/** Golden end-to-end regression: a fixed-seed multi-round crawl must
  * produce bit-identical canonical outputs across engine changes
  * (SURVEY.md §5.2.3). The digest below was produced by the sequential
  * oracle-verified engine; any diff means crawl semantics changed and
  * the golden (plus SURVEY §5 notes) must be consciously re-baselined.
  */
class GoldenCrawlSpec extends SparkSuite {
  import spark.implicits._

  test("fixed-seed crawl digest is stable") {
    val cfg = CrawlConfig(
      web = WebConfig(seed = 4242, nHosts = 3, listPagesPerHost = 2,
                      detailsPerList = 5, crossHostLinkPct = 20,
                      paginationFanout = 1),
      outDir = tmpDir("golden-"), maxRounds = 30,
      hostCapacity = 5.0, hostRefill = 5.0)
    val last = new CrawlScheduler(spark, cfg).run()
    val snaps = new Snapshots(cfg.outDir)

    val logLines = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[FetchLogEntry]].schema)
      .parquet(snaps.fetchLogPaths(last): _*).as[FetchLogEntry].collect()
      .sortBy(e => (e.round, e.host_hash, e.seq))
      .map(e => s"${e.round}|${e.host}|${e.seq}|${e.url}|${e.status}")
    val seenLines = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[SeenEntry]].schema)
      .parquet(snaps.seenPaths(snaps.readManifest(last)): _*).as[SeenEntry]
      .collect().sortBy(_.url_hash)
      .map(s => s"${s.url_hash}|${s.status}")
    val docLines = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .parquet(snaps.docsPaths(last): _*).as[Doc].collect().sortBy(_.doc_id)
      .map(d => d.doc_id + "|" +
        d.spans.map(s => s"${s.kind}^${s.text}^${s.media_ref}^${s.offset}").mkString("~"))

    val digest = UrlCanon.sha256Hex(
      (logLines ++ Array("--") ++ seenLines ++ Array("--") ++ docLines).mkString("\n"))
    assert(digest == GoldenCrawlSpec.ExpectedDigest,
           s"golden crawl digest changed: $digest " +
             s"(fetches=${logLines.length}, seen=${seenLines.length}, docs=${docLines.length})")
  }
}

object GoldenCrawlSpec {
  val ExpectedDigest = "1f3da1b7ce804fea1a361b87425485506f2a644f0129600bc9c629c5dd03bb53"
}
