package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.synthweb.SyntheticWeb.mix64

/** Adaptive facet partitioning — the reference's skew-handling move
  * (olx_c226/main.go:214-232): a facet whose item count meets the split
  * threshold (>= 1000 at main.go:220) and which has children is
  * re-queried at finer granularity; leaves become the crawl partitions.
  *
  * Spark formulation: recursion becomes a driver-side fixpoint loop,
  * each iteration ONE distributed pass over the still-hot facets
  * (`flatMap` into children). Hot facets are the frontier; settled
  * leaves accumulate in a union. This is input-space partitioning, not
  * join skew — AQE cannot do it; the loop is the engine's explicit
  * skew-splitting operator.
  *
  * Scale note: the hot set shrinks geometrically (children partition the
  * parent count), so the loop depth is O(log_k(maxCount/threshold));
  * every pass is shuffle-free (flatMap + filter only), and the leaf
  * union stays un-materialized until the caller acts on it.
  */
object FacetSplit {

  /** The facet "API": children of a facet with their item counts.
    * Pure + deterministic in-sandbox; a live HTTP facet endpoint
    * implements the same trait outside it.
    */
  trait FacetApi extends Serializable {
    def children(id: String): Seq[(String, Long)]
  }

  /** Deterministic synthetic facet tree: each facet splits into 2-4
    * children whose counts partition the parent's; leaves occur when a
    * child's share drops under ~1/8 of the parent or depth is exhausted.
    */
  final case class SyntheticFacetApi(seed: Long, maxDepth: Int = 6) extends FacetApi {
    override def children(id: String): Seq[(String, Long)] = {
      val depth = id.count(_ == '.')
      if (depth >= maxDepth) return Nil
      // the parent count rides in the id-derived hash space; caller
      // passes counts explicitly, so derive the *shares* only
      val h = mix64(seed ^ id.hashCode.toLong)
      val n = 2 + (math.abs(h) % 3L).toInt
      (0 until n).map(i => (s"$id.$i", math.abs(mix64(h ^ i.toLong)) % 1000L))
    }

    /** Children with counts scaled to partition `parentCount`. */
    def childrenOf(id: String, parentCount: Long): Seq[(String, Long)] = {
      val raw = children(id)
      if (raw.isEmpty) return Nil
      val total = raw.map(_._2).sum.max(1L)
      val scaled = raw.map { case (cid, w) => (cid, parentCount * w / total) }
      val drift = parentCount - scaled.map(_._2).sum
      scaled.updated(0, (scaled.head._1, scaled.head._2 + drift))
    }
  }

  final case class FacetS(id: String, count: Long, depth: Int, settled: Boolean)

  /** Split until no facet meets the threshold (or maxDepth). Returns the
    * leaf partition table (id, count, depth, settled) — the balanced
    * crawl partitioning of the input space. `settled` marks facets that
    * stayed hot but have no finer granularity (unsplittable).
    *
    * Each iteration localCheckpoints the shrinking frontier so the
    * fixpoint loop's lineage stays bounded (the standard Spark pattern
    * for iterative DataFrame algorithms).
    */
  def split(spark: SparkSession, seeds: Seq[(String, Long)],
            api: SyntheticFacetApi, threshold: Long,
            maxDepth: Int = 8): DataFrame = {
    import spark.implicits._
    val thr = threshold
    var frontier = seeds.map { case (id, c) => FacetS(id, c, 0, settled = false) }.toDS()
    var leaves = spark.emptyDataset[FacetS]
    var iter = 0
    var hotLeft = true
    while (hotLeft && iter < maxDepth) {
      frontier = frontier.localCheckpoint()
      leaves = leaves.union(frontier.filter(f => f.count < thr || f.settled))
      val hot = frontier.filter(f => f.count >= thr && !f.settled)
      if (hot.isEmpty) {
        frontier = hot
        hotLeft = false
      } else {
        frontier = hot.flatMap { f =>
          val cs = api.childrenOf(f.id, f.count)
          if (cs.isEmpty) Seq(f.copy(settled = true))
          else cs.map { case (cid, cc) => FacetS(cid, cc, f.depth + 1, settled = false) }
        }
        iter += 1
      }
    }
    leaves.union(frontier)
      .select(col("id"), col("count"), col("depth"), col("settled"))
  }
}
