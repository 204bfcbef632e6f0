package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** KMV distinct-count sketch: deterministic given the hash, so every
  * assertion here is EXACT equality — against a from-scratch
  * driver-side recompute (java MessageDigest, no Spark functions), on
  * the merge property, and on the exact-below-k path.
  */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private val K = 64

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Independent reimplementation of the whole sketch on the driver:
    * md5 via MessageDigest, hex prefix → long, sort, top-k, integer
    * division. Shares no code with ops/Sketches.
    */
  private def bruteKmv(rows: Seq[(String, String)],
                       k: Int): Map[String, (Long, Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16)
    }
    rows.groupBy(_._1).map { case (g, vs) =>
      val kept = vs.map(v => h(v._2)).distinct.sorted.take(k)
      val kth = kept.max
      val est =
        if (kept.size < k) kept.size.toLong
        else (k - 1).toLong * (1L << 56) / math.max(kth, 1L)
      g -> ((kept.size.toLong, kth, est))
    }
  }

  test("sketch estimate equals a from-scratch driver recompute on real documents") {
    val sk = Sketches.kmvSketch(docs, "lang", "text", K)
    val got = Sketches.kmvEstimate(sk, "lang", K)
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, n, kth, est) => g -> ((n, kth, est)) }.toMap
    val want = bruteKmv(
      docs.select("lang", "text").as[(String, String)].collect().toSeq, K)
    assert(got == want)
    // and the estimator is actually estimating: within 2x of truth
    val exact = docs.groupBy("lang").agg(countDistinct("text").as("n"))
      .as[(String, Long)].collect().toMap
    got.foreach { case (g, (_, _, est)) =>
      val n = exact(g).toDouble
      assert(est > n / 2 && est < n * 2, s"$g: est $est vs exact $n")
    }
  }

  test("merge of shard sketches equals the sketch of the whole, exactly") {
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(a, "lang", "text", K),
      Sketches.kmvSketch(b, "lang", "text", K), "lang", K)
    val whole = Sketches.kmvSketch(docs, "lang", "text", K)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // finalized estimates agree too
    val em = Sketches.kmvEstimate(merged, "lang", K)
      .as[(String, Long, Long, Long)].collect().toSet
    val ew = Sketches.kmvEstimate(whole, "lang", K)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(em == ew)
  }

  test("below-k groups are exact: the sketch IS the distinct set; nulls are absence") {
    val tiny = Seq(Some("a"), Some("b"), Some("c"), Some("a"), None)
      .map(v => "g" -> v)
      .++(Seq("h" -> Some("x")))
      .toDF("grp", "v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(tiny, "grp", "v", K), "grp", K)
      .select("grp", "n_kept", "est_distinct")
      .as[(String, Long, Long)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(est("g") == ((3L, 3L)))
    assert(est("h") == ((1L, 1L)))
  }

  test("pair estimates equal a from-scratch driver recompute (closure property)") {
    val rows = docs.select("lang", "text").as[(String, String)].collect().toSeq
    val sk = Sketches.kmvSketch(docs, "lang", "text", K)
    val got = Sketches.kmvPairEstimates(sk, "lang", K)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map { case (a, b, ea, eb, eu, ei) => (a, b) -> ((ea, eb, eu, ei)) }
      .toMap
    // driver recompute: union sketch straight from the FULL per-group
    // hash sets (not from the k-truncated sketches) — passing iff the
    // closure property (top-k of sketch union == top-k of set union)
    // held in the distributed path
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 14), 16)
    }
    val full: Map[String, Set[Long]] =
      rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(v => h(v._2)).toSet }
    def est(hs: Set[Long]): Long = {
      val kept = hs.toSeq.sorted.take(K)
      if (kept.size < K) kept.size.toLong
      else (K - 1).toLong * (1L << 56) / math.max(kept.max, 1L)
    }
    val langs = full.keys.toSeq.sorted
    val want = (for {
      i <- langs.indices; j <- (i + 1) until langs.length
      a = langs(i); b = langs(j)
      eu = est(full(a) ++ full(b))
      ea = est(full(a)); eb = est(full(b))
    } yield (a, b) -> ((ea, eb, eu, math.max(0L, ea + eb - eu)))).toMap
    assert(got == want)
    assert(got.nonEmpty, "vacuous: no language pairs in the fixture")
  }

  test("pair estimates are exact when both groups are below k") {
    val tiny = Seq("g" -> "a", "g" -> "b", "g" -> "c",
                   "h" -> "b", "h" -> "x").toDF("grp", "v")
    val sk = Sketches.kmvSketch(tiny, "grp", "v", K)
    val got = Sketches.kmvPairEstimates(sk, "grp", K)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // |g|=3, |h|=2, |g ∪ h|=4 ({a,b,c,x}), |g ∩ h|=1 ({b})
    assert(got == Seq(("g", "h", 3L, 2L, 4L, 1L)))
  }

  test("k bounds are enforced") {
    intercept[IllegalArgumentException] {
      Sketches.kmvSketch(docs, "lang", "text", 1)
    }
    intercept[IllegalArgumentException] {
      Sketches.kmvSketch(docs, "lang", "text", 129)
    }
  }
}
