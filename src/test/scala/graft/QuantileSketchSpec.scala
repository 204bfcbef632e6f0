package graft

import org.apache.spark.sql.functions._

import graft.ops.QuantileSketch

/** Log-bucket histogram quantile sketch: exact-equality assertions
  * against an independent driver recompute (Java bit ops — no shared
  * code with the conv-string bucketing), the merge property, and the
  * declared 2^-subBits relative error bound against true percentiles.
  */
class QuantileSketchSpec extends SparkSuite {
  import spark.implicits._

  private val S = 4

  // independent bucket math: numberOfLeadingZeros, not binary strings
  private def bid(v: Long): Long = {
    val base = 1L << S
    if (v < base) v
    else {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
      msb.toLong * base + (v >> (msb - S)) - base
    }
  }
  private def blo(id: Long): Long = {
    val base = 1L << S
    if (id < base) id
    else ((id % base) + base) << ((id / base).toInt - S)
  }

  private lazy val cents =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
              floor(col("l_extendedprice") * 100).cast("long").as("x"))

  test("bucket id and lower bound agree with the independent bit-ops recompute") {
    val vals = (Seq(1L, 15L, 16L, 17L, 31L, 32L, 1000L, 123456789L,
                    (1L << 40) - 1, 1L << 40, Long.MaxValue / 3) ++
      (1 to 200).map(i => i.toLong * 7919L)).distinct
    val got = vals.toDF("v")
      .select(col("v"), QuantileSketch.bucketId("v", S).as("id"))
      .withColumn("lo", QuantileSketch.bucketLower("id", S))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (v, id, lo) =>
      assert(id == bid(v), s"id($v)")
      assert(lo == blo(id), s"lo($id)")
      assert(lo <= v, s"lower bound above value: $v -> $lo")
      assert(v - lo <= math.max(lo >> S, 0L),
             s"bucket wider than the declared 2^-$S relative width: $v in $lo")
    }
    // monotone: sorting by id equals sorting by value
    val byV = got.sortBy(_._1).map(_._2)
    assert(byV.sameElements(byV.sorted))
  }

  test("sketch quantiles equal a from-scratch driver recompute") {
    val sk = QuantileSketch.histSketch(cents, "g", "x", S)
    val got = QuantileSketch.histQuantiles(sk, "g", Seq(50, 90, 99), S)
      .as[(String, Int, Long)].collect()
      .map { case (g, p, e) => (g, p) -> e }.toMap
    val rows = cents.as[(String, Long)].collect().filter(_._2 > 0)
    val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val ids = vs.map(v => bid(v._2)).sorted
      val n = ids.length.toLong
      Seq(50, 90, 99).map { p =>
        val rank = ((p.toLong * n + 99) / 100).toInt // ceil, 1-based
        (g, p) -> blo(ids(rank - 1))
      }
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("estimates are within the declared relative error of the true percentiles") {
    val sk = QuantileSketch.histSketch(cents, "g", "x", S)
    val got = QuantileSketch.histQuantiles(sk, "g", Seq(50, 90, 99), S)
      .as[(String, Int, Long)].collect()
    val rows = cents.as[(String, Long)].collect().filter(_._2 > 0)
    val exact = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> Seq(50, 90, 99).map { p =>
        val rank = ((p.toLong * sorted.length + 99) / 100).toInt
        p -> sorted(rank - 1)
      }.toMap
    }
    got.foreach { case (g, p, est) =>
      val t = exact(g)(p)
      assert(est <= t, s"$g p$p: est $est above true $t")
      assert(t - est <= math.max(est >> S, 1L),
             s"$g p$p: est $est misses true $t by more than 2^-$S relative")
    }
  }

  test("merge of shard sketches equals the sketch of the whole, exactly") {
    val a = cents.filter(pmod(col("x"), lit(2)) === 0)
    val b = cents.filter(pmod(col("x"), lit(2)) === 1)
    val merged = QuantileSketch.histMerge(
      QuantileSketch.histSketch(a, "g", "x", S),
      QuantileSketch.histSketch(b, "g", "x", S), "g")
    val whole = QuantileSketch.histSketch(cents, "g", "x", S)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("parameter bounds are enforced") {
    intercept[IllegalArgumentException] {
      QuantileSketch.histSketch(cents, "g", "x", 0)
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.histQuantiles(
        QuantileSketch.histSketch(cents, "g", "x", S), "g", Seq(0), S)
    }
  }

  test("a group column named like a reserved column fails loud") {
    val renamed = cents.withColumnRenamed("g", "__v")
    val e = intercept[IllegalArgumentException] {
      QuantileSketch.histSketch(renamed, "__v", "x", S)
    }
    assert(e.getMessage.contains("__v"))
    intercept[IllegalArgumentException] {
      QuantileSketch.histSketch(cents.withColumnRenamed("g", "bucket"),
                                "bucket", "x", S)
    }
  }
}
