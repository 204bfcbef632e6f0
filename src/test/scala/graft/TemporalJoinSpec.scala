package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoin

/** The two temporal operators (backward as-of join, bucketed interval
  * range join) against hand-built boundary fixtures AND brute-force
  * recomputations over the real sf0.001 events table — the in-suite
  * counterpart of q96/q97's DuckDB gates.
  */
class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("asofBackward: boundary fixture — inclusive match, carry, no-match null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // exact tie with a right row
      (2L, 10L, ts("2024-01-01 10:30:00")), // carries the 10:00 payload
      (3L, 10L, ts("2024-01-01 09:59:59")), // before any right row: null
      (4L, 11L, ts("2024-01-01 12:00:00")), // key with no right rows
      (5L, 10L, ts("2024-01-01 11:00:00"))  // newer right row wins
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100L, 1.5),
      (10L, ts("2024-01-01 10:45:00"), 101L, 2.5)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = TemporalJoin
      .asofBackward(left, right, "user_id", "ts", "ts",
                    Seq("purchase_id", "purchase_value"))
      .select("event_id", "purchase_id", "purchase_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) == ((Some(100L), Some(1.5)))) // ts >= right ts: inclusive
    assert(out(2L) == ((Some(100L), Some(1.5))))
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((None, None)))
    assert(out(5L) == ((Some(101L), Some(2.5))))
  }

  test("asofForward: boundary fixture — inclusive match, earliest-following wins, no-match null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // exact tie with a right row
      (2L, 10L, ts("2024-01-01 09:30:00")), // earliest following = 10:00
      (3L, 10L, ts("2024-01-01 10:46:00")), // after last right: null
      (4L, 11L, ts("2024-01-01 12:00:00")), // key with no right rows
      (5L, 10L, ts("2024-01-01 10:01:00"))  // next right (10:45) wins
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100L, 1.5),
      (10L, ts("2024-01-01 10:45:00"), 101L, 2.5)
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")
    val out = TemporalJoin
      .asofForward(left, right, "user_id", "ts", "ts",
                   Seq("purchase_id", "purchase_value"))
      .select("event_id", "purchase_id", "purchase_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) == ((Some(100L), Some(1.5)))) // ts <= right ts: inclusive
    assert(out(2L) == ((Some(100L), Some(1.5))))
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((None, None)))
    assert(out(5L) == ((Some(101L), Some(2.5))))
  }

  test("asofForward equals the brute-force inequality join on real events") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("purchase_id"))
    val got = TemporalJoin
      .asofForward(clicks, purchases, "user_id", "ts", "ts",
                   Seq("purchase_id"))
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    // brute force: min-ts right at-or-after, per left row
    val want = clicks.alias("c")
      .join(purchases.alias("p"),
            col("c.user_id") === col("p.user_id") &&
              col("p.ts") >= col("c.ts"), "left")
      .groupBy(col("c.event_id"))
      .agg(min_by(col("p.purchase_id"), col("p.ts")).as("purchase_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == want)
    assert(got.valuesIterator.exists(_.isDefined) &&
             got.valuesIterator.exists(_.isEmpty),
           "fixture must exercise both match and no-match rows")
  }

  test("asof: a null right timestamp is never a carry, in either direction") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, Option.empty[Timestamp], 666L))
      .toDF("user_id", "ts", "purchase_id")
    for (fwd <- Seq(false, true)) {
      val op =
        if (fwd) TemporalJoin.asofForward _ else TemporalJoin.asofBackward _
      val out = op(left, right, "user_id", "ts", "ts", Seq("purchase_id"))
        .select("purchase_id").as[Option[Long]].collect()
      assert(out.toSeq == Seq(None), s"forward=$fwd matched a null-ts right row")
    }
  }

  test("asofBackward: null keys never match, on either side") {
    val left = Seq(
      (1L, Some(10L), ts("2024-01-01 10:30:00")),
      (2L, None, ts("2024-01-01 10:30:00")) // null key: null payload
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), ts("2024-01-01 10:00:00"), 100L),
      // a null-key right row must not become anyone's carry — SQL
      // equality semantics, NULL matches nothing
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 666L)
    ).toDF("user_id", "ts", "purchase_id")
    val out = TemporalJoin
      .asofBackward(left, right, "user_id", "ts", "ts", Seq("purchase_id"))
      .select("event_id", "purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(100L))
    assert(out(2L) == None)
  }

  test("intervalJoin: a span past maxSpanBuckets fails loud, not silently exploding") {
    val probes = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("pid", "pts")
    val ivs = Seq((ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("s", "e") // 86400 one-second buckets
    val e = intercept[Exception] {
      TemporalJoin.intervalJoin(probes, "pts", ivs, "s", "e",
                                bucketSec = 1L, maxSpanBuckets = 100L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("spans more than 100 buckets")),
           s"wrong error: ${msgs(e)}")
  }

  test("intervalJoin refuses DST session zones for non-instant columns") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // timestamp literals from toDF are TIMESTAMP (instant) — build an
      // NTZ column to hit the guarded path
      val probes = Seq("2024-01-01 00:00:30").toDF("raw")
        .select(col("raw").cast("timestamp_ntz").as("pts"), lit(1L).as("pid"))
      val ivs = Seq(("2024-01-01 00:00:00", "2024-01-01 01:00:00"))
        .toDF("rs", "re")
        .select(col("rs").cast("timestamp_ntz").as("s"),
                col("re").cast("timestamp_ntz").as("e"))
      val e = intercept[IllegalArgumentException] {
        TemporalJoin.intervalJoin(probes, "pts", ivs, "s", "e", 1800L)
      }
      assert(e.getMessage.contains("fixed-offset"))
      // and the same shape is accepted under UTC
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val n = TemporalJoin
        .intervalJoin(probes, "pts", ivs, "s", "e", 1800L).count()
      assert(n == 1L)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("asofBackward equals the brute-force inequality join on real events") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("purchase_id"), max("value").as("purchase_value"))
    val got = TemporalJoin
      .asofBackward(clicks, purchases, "user_id", "ts", "ts",
                    Seq("purchase_id", "purchase_value"))
    // brute force: inequality join + keep the latest right row per click
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                             col("purchase_id"), col("purchase_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("p_ts").desc)
    val want = clicks
      .join(p, col("user_id") === col("p_user") && col("ts") >= col("p_ts"),
            "left")
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select("event_id", "user_id", "ts", "purchase_id", "purchase_value")
    assert(got.count() == clicks.count()) // left-outer: no row lost
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // non-vacuous both ways: some matched, some null
    assert(got.filter(col("purchase_id").isNull).count() > 0)
    assert(got.filter(col("purchase_id").isNotNull).count() > 0)
  }

  test("intervalJoin: boundary fixture — start inclusive, end exclusive, multi-bucket spans") {
    val probes = Seq(
      (1L, ts("2024-01-01 10:00:00")), // == start: in
      (2L, ts("2024-01-01 10:29:59")), // inside: in
      (3L, ts("2024-01-01 10:30:00")), // == end: out
      (4L, ts("2024-01-01 09:59:59")), // before: out
      (5L, ts("2024-01-01 13:10:00"))  // inside the long window only
    ).toDF("event_id", "ts")
    val windows = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      // 4h window spanning many 30-min buckets
      (200L, ts("2024-01-01 09:30:00"), ts("2024-01-01 13:30:00")),
      // empty interval: contributes nothing
      (300L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"))
    ).toDF("purchase_id", "w_start", "w_end")
    val out = TemporalJoin
      .intervalJoin(probes, "ts", windows, "w_start", "w_end", 1800L)
      .select("event_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L),
                      (3L, 200L), (4L, 200L), (5L, 200L)))
  }

  test("intervalJoin equals the brute-force cross join on real events, at several widths") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "ts")
    val windows = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("w_start"),
              (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    val want = clicks.crossJoin(windows)
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    // exactness must not depend on the width matching the interval
    for (width <- Seq(60L, 1800L, 7200L)) {
      val got = TemporalJoin
        .intervalJoin(clicks, "ts", windows, "w_start", "w_end", width)
        .select("event_id", "purchase_id")
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at width $width")
      assert(got.toSet == want, s"pair set diverges at width $width")
    }
  }

  test("intervalJoin plans a shuffled equi-join on the bucket, never a nested loop") {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "ts")
    val windows = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("w_start"),
              (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    val joined = TemporalJoin
      .intervalJoin(clicks, "ts", windows, "w_start", "w_end", 1800L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the 100 TB shape: with broadcast off (neither side fits), the
    // plan degrades to a SHUFFLED equi-join on the bucket — never a
    // nested loop — and the pair count is unchanged
    val n = joined.count()
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val wide = TemporalJoin
        .intervalJoin(clicks, "ts", windows, "w_start", "w_end", 1800L)
      assert(wide.count() == n)
      val widePlan = wide.queryExecution.executedPlan.toString
      assert(widePlan.contains("SortMergeJoin") ||
               widePlan.contains("ShuffledHashJoin"), widePlan)
      assert(!widePlan.contains("BroadcastNestedLoopJoin"), widePlan)
    } finally spark.conf.set(thresholdKey, saved)
  }

  test("intervalJoin: reserved scratch columns fail loud") {
    val probes = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("pid", "pts")
      .withColumn("__bucket", lit(0L))
    val ivs = Seq((ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("s", "e")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoin.intervalJoin(probes, "pts", ivs, "s", "e", 1800L)
    }
    assert(e1.getMessage.contains("__bucket"))
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoin.intervalJoin(probes.drop("__bucket"), "pts",
                                ivs.withColumn("__b1", lit(0L)),
                                "s", "e", 1800L)
    }
    assert(e2.getMessage.contains("__b1"))
  }
}
