package graft

import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

class BloomPruneSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def bigSmall() = {
    val big = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("okey"), col("l_quantity"),
              col("l_extendedprice"))
    val small = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") > 250000.0)
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    (big, small)
  }

  test("bloom-prefiltered join equals the plain join exactly") {
    val (big, small) = bigSmall()
    val got = BloomPrune.bloomPrefilteredJoin(big, small, "okey")
      .orderBy("okey", "l_quantity", "l_extendedprice")
      .collect()
    val want = big.join(small, Seq("okey"))
      .orderBy("okey", "l_quantity", "l_extendedprice")
      .collect()
    assert(got.toSeq == want.toSeq)
    assert(want.nonEmpty, "vacuous: the fixture join matched nothing")
  }

  test("pruning is real and bounded by the false-positive rate") {
    val (big, small) = bigSmall()
    val filter = BloomPrune.buildKeyBloom(small, "okey", fpp = 0.001)
    val bc = spark.sparkContext.broadcast(filter)
    val total = big.count()
    val kept = big.filter(BloomPrune.mightContainCol(col("okey"), bc)).count()
    val exact = big.join(small.select("okey").distinct(), Seq("okey"),
                         "leftsemi").count()
    assert(kept >= exact, "bloom dropped a matching row (false negative!)")
    assert(kept < total, "bloom pruned nothing on a selective small side")
    // at fpp=0.001 the surplus over the exact semi-join is a ~0.1%
    // sliver of the non-matching rows, not a flood
    assert(kept - exact <= math.max(20L, (total - exact) / 100),
           s"false-positive flood: kept=$kept exact=$exact total=$total")
  }

  test("the probe sits under the join's exchange, fused with the scan") {
    val (big, small) = bigSmall()
    // force the shuffled-join path so the exchange exists to pin against
    val joined = BloomPrune.bloomPrefilteredJoin(
      big, small.hint("shuffle_hash"), "okey")
    joined.collect()
    // flatten through AQE wrappers: QueryStageExec nodes are leaves to
    // `collect`, so descend into their materialized plans explicitly
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec        => p +: flatten(q.plan)
      case _                        => p +: p.children.flatMap(flatten)
    }
    val nodes = flatten(joined.queryExecution.executedPlan)
    def isBloomFilter(p: SparkPlan): Boolean = p match {
      case f: FilterExec =>
        f.condition.toString.toLowerCase.contains("bloommightcontain")
      case _ => false
    }
    val bloomFilters = nodes.filter(isBloomFilter)
    assert(bloomFilters.nonEmpty,
           s"no bloom filter node in plan:\n${nodes.head}")
    assert(nodes.exists(_.isInstanceOf[Exchange]),
           s"fixture lost its shuffle — the pin is vacuous:\n${nodes.head}")
    // no exchange below the bloom probe: it filters scan output directly
    bloomFilters.foreach { f =>
      val below = flatten(f).drop(1).filter(_.isInstanceOf[Exchange])
      assert(below.isEmpty,
             s"bloom probe sits above an exchange — pruning after the shuffle:\n${nodes.head}")
    }
  }

  test("probe agrees between codegen and interpreted eval") {
    val (big, small) = bigSmall()
    val filter = BloomPrune.buildKeyBloom(small, "okey")
    val bc = spark.sparkContext.broadcast(filter)
    val probe = BloomPrune.mightContainCol(col("okey"), bc)
    val viaSpark = big.select(col("okey"), probe.as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val keys = big.select("okey").collect().map(_.getLong(0)).distinct
    keys.foreach { k =>
      val hex = graft.canon.UrlCanon.sha256Hex(k.toString)
      assert(viaSpark(k) == filter.mightContain(hex),
             s"codegen/driver disagreement for key $k")
    }
  }

  test("the filter is a persistable artifact: serialize → disk → reuse, identical pruning") {
    val (big, small) = bigSmall()
    val built = BloomPrune.buildKeyBloom(small, "okey")
    val path = java.nio.file.Paths.get(tmpDir("bloomp"), "keys.bloom")
    java.nio.file.Files.write(path, built.serialize())
    // a later query (or a later ROUND) reloads the artifact instead of
    // re-scanning the small side — the cross-query reuse the operator
    // exists for
    val reloaded = graft.seen.BloomFilter.deserialize(
      java.nio.file.Files.readAllBytes(path))
    val bc = spark.sparkContext.broadcast(reloaded)
    val keptReloaded =
      big.filter(BloomPrune.mightContainCol(col("okey"), bc)).count()
    val bcOrig = spark.sparkContext.broadcast(built)
    val keptOrig =
      big.filter(BloomPrune.mightContainCol(col("okey"), bcOrig)).count()
    assert(keptReloaded == keptOrig)
    assert(reloaded.itemCount == built.itemCount)
  }

  test("mismatched key types are refused (string-form hashing vs join coercion)") {
    import spark.implicits._
    val big = Seq((1.0, "a")).toDF("okey", "v") // double 1.0 → "1.0"
    val small = Seq((1L, "x")).toDF("okey", "w") // long 1 → "1"
    val e = intercept[IllegalArgumentException] {
      BloomPrune.bloomPrefilteredJoin(big, small, "okey")
    }
    assert(e.getMessage.contains("types differ"))
  }

  test("null keys are dropped by the probe, matching inner-join semantics") {
    import spark.implicits._
    val big = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"))
      .toDF("okey", "v")
    val small = Seq((1L, "x")).toDF("okey", "w")
    val got = BloomPrune.bloomPrefilteredJoin(big, small, "okey").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("a"))
  }
}
