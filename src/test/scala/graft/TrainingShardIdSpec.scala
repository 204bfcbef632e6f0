package graft

import org.apache.spark.sql.functions._

/** q67's corpus-scale surrogate-id path: the 60-bit hex-prefix
  * surrogate (`scaleIds = true`, zero-shuffle) must produce the exact
  * same training-shard table as the driver-scale `row_number` path the
  * DuckDB oracle mirrors — same docs dropped by near-dup, same rows,
  * same order — and the fixture must be collision-free on the 15-char
  * prefix (the documented validity condition of the scale path).
  */
class TrainingShardIdSpec extends SparkSuite {

  test("hex-prefix surrogate id: zero collisions on the crawl fixture") {
    val ids = SparkEntry.entry(spark).select("doc_id")
    val n = ids.count()
    val nPrefix = ids.select(substring(col("doc_id"), 1, 15)).distinct().count()
    assert(n > 0 && n == nPrefix,
           s"15-hex-prefix collision on the fixture: $nPrefix distinct of $n")
    // and the surrogate itself is a valid non-negative long for every id
    val bad = ids
      .select(conv(substring(col("doc_id"), 1, 15), 16, 10).cast("long").as("nid"))
      .filter(col("nid").isNull || col("nid") < 0).count()
    assert(bad == 0, s"$bad invalid hex-prefix surrogates")
  }

  test("scale-id path produces the identical training shard (same near-dup drop set)") {
    val rowNum = SparkEntry.trainingShard(spark, scaleIds = false).collect()
    val hexPfx = SparkEntry.trainingShard(spark, scaleIds = true).collect()
    assert(rowNum.nonEmpty, "degenerate fixture: empty training shard")
    assert(rowNum.length == hexPfx.length,
           s"row counts differ: ${rowNum.length} vs ${hexPfx.length}")
    rowNum.zip(hexPfx).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs: $a vs $b")
    }
  }
}
