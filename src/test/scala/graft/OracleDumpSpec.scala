package graft

import graft.oracle.SeqOracles

/** The sequential oracle dumps must equal the distributed queries they
  * oracle — schema AND rows — so a drift fails `sbt test` before it can
  * fail the driver's DuckDB gate.
  */
class OracleDumpSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val dumped: Unit = SeqOracles.writeAll(spark, dir)

  /** Queries oracled by a parquet dump (name -> dump dir name). */
  private val dumpQueries = Seq(
    "q28_simhash", "q32_fingerprint", "q35_ann_lsh", "q57_ann_ivf",
    "q68_ivf_index_topk",
    "q37_image_meta",
    "q38_frame_sample", "q71_frame_profile", "q39_media_from_crawl", "q43_next_data_extract",
    "q44_enrich_join", "q45_facet_split", "q50_crawl_docs",
    "q51_crawl_fetch_log", "q93_rank_crawl_log", "q52_crawl_spans",
    "q60_ua_pick", "q61_auth_enrich", "q64_stream_sessions")

  test("every dump matches its Spark query: schema and rows") {
    dumped
    dumpQueries.foreach { name =>
      val got = SparkEntry.queries(name)(spark, dir)
      val want = spark.read.parquet(s"${SeqOracles.root}/$name")
      // names + types must match (nullability differs benignly between
      // a fresh case-class Dataset and its parquet round-trip)
      def shape(df: org.apache.spark.sql.DataFrame) =
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      assert(shape(got) == shape(want),
             s"$name schema drift:\n got ${shape(got)}\nwant ${shape(want)}")
      val g = got.collect().map(_.toString).sorted.toSeq
      val w = want.collect().map(_.toString).sorted.toSeq
      assert(g.size == w.size, s"$name rows: got ${g.size}, want ${w.size}")
      g.zip(w).foreach { case (a, b) =>
        assert(a == b, s"$name row mismatch:\n got $a\nwant $b")
      }
    }
  }

  test("q53 aggregation over the dumped oracle fetch log matches") {
    dumped
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q53_crawl_metrics")(spark, dir)
    val want = spark.read.parquet(s"${SeqOracles.root}/q51_crawl_fetch_log")
      .groupBy(col("round"), pmod(col("host_hash"), lit(32)).as("bucket"))
      .agg(count(lit(1)).as("fetched"),
           sum(when(col("status") === 200, 1L).otherwise(0L)).as("fetched_ok"),
           sum(when(col("status") === 404, 1L).otherwise(0L)).as("fetched_404"),
           sum(when(col("status") =!= 200 && col("status") =!= 404, 1L)
             .otherwise(0L)).as("fetched_retryable"))
    assert(got.collect().map(_.toString).sorted.toSeq ==
             want.collect().map(_.toString).sorted.toSeq)
  }

  test("oracleSql now covers every query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
           s"uncovered: ${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
  }
}
