package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.{Doc, Span}
import graft.streaming.Streams

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def sampleDocs(n: Int): Seq[Doc] =
    (0 until n).map { i =>
      Doc(f"d$i%04d", s"https://h-${i % 3}.test/item/$i", s"h-${i % 3}.test",
          1 + i % 4,
          Seq(Span("text", s"hello world $i", "", 0),
              Span("image", "", s"https://h.test/img-$i.jpg", 1)))
    }

  test("docs stream micro-batches to parquet (K1/ST1 analogue)") {
    val src = Files.createTempDirectory("stream-src-").toString
    val out = Files.createTempDirectory("stream-out-").toString
    val chk = Files.createTempDirectory("stream-chk-").toString
    sampleDocs(40).toDS().write.mode("append").parquet(src)

    val q = Streams.docsToParquet(spark, src, out, chk,
                                  trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    val got = spark.read.parquet(out)
    assert(got.count() == 40)
    assert(got.columns.contains("n_tokens") && got.columns.contains("n_media"))
    val row = got.filter(col("doc_id") === "d0001").head()
    assert(row.getAs[Int]("n_tokens") == 3) // "hello world 1"
    assert(row.getAs[Int]("n_media") == 1)

    // second batch appends (stream resumes from checkpoint)
    sampleDocs(10).map(d => d.copy(doc_id = "x" + d.doc_id)).toDS()
      .write.mode("append").parquet(src)
    val q2 = Streams.docsToParquet(spark, src, out, chk,
                                   trigger = Trigger.AvailableNow())
    q2.awaitTermination(60000)
    // checkpoint resume: only the 10 new files processed, appended to out
    assert(spark.read.parquet(out).count() == 50)
  }

  test("watermarked windowed counts run on the events table") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val agg = Streams.windowedEventCounts(events, "1 day", "1 day", "1 hour")
    // batch execution of the same plan validates the aggregation shape
    val n = agg.count()
    assert(n > 0)
    assert(agg.columns.toSeq ==
      Seq("win_start", "event_type", "n", "total_value"))
  }

  test("stateful host progress accumulates per key") {
    val ds = sampleDocs(30).toDS()
    val prog = Streams.hostProgress(ds).collect().map(p => p.host -> p).toMap
    assert(prog.size == 3)
    assert(prog("h-0.test").pages == 10)
    assert(prog("h-0.test").spans == 20)
    assert(prog.values.map(_.pages).sum == 30)
  }
}
