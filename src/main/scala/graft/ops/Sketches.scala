package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the third of the
  * brief's custom-operator triple (as-of join, range join, a sketch).
  * Unlike HLL-family sketches, KMV is DETERMINISTIC given the hash
  * function: the sketch state is literally the k smallest distinct
  * hash values per group, so an independent engine recomputes the
  * exact same state and estimate — q98's DuckDB oracle re-derives it
  * from scratch (md5 prefix → bigint → window top-k → integer
  * division) and hash-matches bit-for-bit.
  *
  * Scale shape: one exchange for the distinct, then the same salted
  * two-phase top-k the skew operators use ([[Skew.topKByGroup]]) —
  * task memory O(k) regardless of group size, no whole-group
  * materialization. The sketch is MERGEABLE (union + re-top-k), which
  * is what makes it a sketch rather than a query: shard-local sketches
  * at 100 TB combine associatively into the global one
  * ([[kmvMerge]]; SketchesSpec pins merge == whole exactly).
  *
  * Estimator: with h uniform on [0, 2^56) (first 14 hex chars of
  * md5), E[kth smallest of n distinct] ≈ k/(n+1) · 2^56, so
  * n̂ = (k-1) · 2^56 / h_(k); when fewer than k distinct values
  * exist the sketch IS the exact distinct set. All arithmetic stays
  * in integer division (`div`) so the distributed result is bit-equal
  * to any sequential recomputation — no IEEE rounding in the path.
  */
object Sketches {

  /** 56-bit uniform hash: first 14 hex chars of md5 as a long.
    * 56 bits keeps (k-1) · 2^56 inside int64 for k ≤ 128.
    */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  private def checkK(k: Int): Unit =
    require(k >= 2 && k <= 128, s"k must be in [2, 128]: $k")

  /** Build the sketch: the k smallest DISTINCT hash values per group,
    * as rows (groupCol, hv). Distinct first — KMV order statistics
    * are over the distinct hash set, not the multiset. Null values
    * are absence, not a member: a null hv would sort FIRST under the
    * ascending top-k (Spark ascending = nulls first), stealing a
    * sketch slot count() sees but max("hv") ignores — so they are
    * dropped here, matching COUNT(DISTINCT) semantics.
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int, salts: Int = 16): DataFrame = {
    checkK(k)
    val hashed = df
      .select(col(groupCol), kmvHash(col(valueCol)).as("hv"))
      .filter(col("hv").isNotNull)
      .distinct()
    // hv is unique within a group after distinct, so it is a total
    // ordering by itself
    Skew.topKByGroup(hashed, groupCol, Seq(col("hv").asc), k, salts)
  }

  /** Merge two sketches over the same group/k: union, re-dedupe (a
    * value present on both sides carries the same hash), re-top-k.
    * Associative and commutative — the shard-combine path.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCol: String, k: Int,
               salts: Int = 16): DataFrame = {
    checkK(k)
    Skew.topKByGroup(a.unionByName(b).distinct(), groupCol,
                     Seq(col("hv").asc), k, salts)
  }

  /** Finalize: per group, (n_kept, kth_min, est_distinct). Exact when
    * the group held fewer than k distinct values; otherwise the
    * (k-1)·2^56 div h_(k) estimator, integer division throughout
    * (h_(k) = 0 has probability 2^-56 per value; guarded to keep the
    * expression total).
    */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame =
    estimateBy(sketch, Seq(groupCol), k)

  private def estimateBy(sketch: DataFrame, groupCols: Seq[String],
                         k: Int): DataFrame = {
    checkK(k)
    val num = (k - 1).toLong * (1L << 56)
    sketch
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max("hv").as("kth_min"))
      .withColumn(
        "est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${num}L div greatest(kth_min, 1L)")))
  }

  /** All-pairs set-operation estimates from one per-group sketch table:
    * for every unordered group pair (ga < gb), the estimated distinct
    * count of each side, of the union, and of the intersection
    * (inclusion-exclusion, clamped at 0). Rides on the classic KMV
    * closure property: the k smallest of (sketch(A) ∪ sketch(B)) ARE
    * the k smallest of A ∪ B, so the union sketch is exact sketch
    * algebra — no second pass over the data. When the union's kept
    * count is below k both inputs were complete distinct sets and
    * every figure is exact.
    *
    * Scale shape: inputs are sketch ROWS (O(groups · k), independent
    * of data size), so the pair expansion is sketch-side tiny — the
    * pair list broadcasts, the union re-top-k reuses the salted
    * two-phase machinery on the composite pair key, and nothing ever
    * revisits the raw table. Integer arithmetic throughout — the
    * estimates are bit-reproducible by an independent engine (q100's
    * oracle re-derives everything from scratch in SQL).
    */
  def kmvPairEstimates(sketch: DataFrame, groupCol: String, k: Int,
                       salts: Int = 16): DataFrame = {
    checkK(k)
    val singles = estimateBy(sketch, Seq(groupCol), k)
      .select(col(groupCol), col("est_distinct"))
    val groups = sketch.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("ga"))
      .join(groups.select(col(groupCol).as("gb")), col("ga") < col("gb"))
    val sideA = pairs.join(
      sketch.select(col(groupCol).as("ga"), col("hv")), Seq("ga"))
    val sideB = pairs.join(
      sketch.select(col(groupCol).as("gb"), col("hv")), Seq("gb"))
    val unioned = sideA.select("ga", "gb", "hv")
      .unionByName(sideB.select("ga", "gb", "hv"))
      .distinct() // a value in both sketches carries the same hash
    // composite (ga, gb) group key — partitioned on the columns
    // directly, so no separator byte and no cross-pair collisions
    val unionSketch =
      Skew.topKByGroups(unioned, Seq("ga", "gb"), Seq(col("hv").asc),
                        k, salts)
    estimateBy(unionSketch, Seq("ga", "gb"), k)
      .withColumnRenamed("est_distinct", "est_union")
      .drop("n_kept", "kth_min")
      .join(singles.withColumnRenamed(groupCol, "ga")
              .withColumnRenamed("est_distinct", "est_a"), Seq("ga"))
      .join(singles.withColumnRenamed(groupCol, "gb")
              .withColumnRenamed("est_distinct", "est_b"), Seq("gb"))
      .withColumn("est_inter",
                  greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .select("ga", "gb", "est_a", "est_b", "est_union", "est_inter")
  }
}
