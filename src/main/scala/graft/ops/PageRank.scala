package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank over a directed edge list — the
  * authority score behind real crawl frontier prioritization (OPIC /
  * PageRank-ordered fetch queues), usable anywhere a reproducible
  * graph centrality is needed.
  *
  * Why fixed-point: floating-point PageRank is NOT reproducible across
  * engines or even runs — double summation depends on reduction order,
  * so a distributed aggregate and a sequential recomputation disagree
  * in the last ulps and any rounded comparison eventually flips a
  * digit. Here ranks are Longs scaled by 1e12 and every step is
  * integer arithmetic (floor division for contributions and damping),
  * which commutes and associates EXACTLY: the distributed run is
  * bit-identical to a sequential oracle, at any parallelism, forever.
  * The cost is a deterministic rounding-down drift of at most
  * (in-degree) units per node per iteration — invisible at the 1e12
  * scale and identical on both sides by construction.
  *
  * Scale shape: per iteration, one hash join of the skinny edge list
  * against (node, rank) plus one partial-aggregated sum keyed on dst —
  * the same exchanges as one connected-components half-round. Lineage
  * is truncated per iteration with an eager localCheckpoint (use
  * checkpoint() + a reliable dir on a cluster), so 10 iterations plan
  * as 10 shallow jobs, not one exponential tree.
  *
  * Dangling nodes (no out-edges) leak their mass — the classic
  * simplified formulation. Callers whose graphs can dangle should add
  * self-loops or symmetrize (a bipartite both-direction graph, as in
  * q88, has none).
  */
object PageRank {

  val scale: Long = 1000000000000L

  /** (node, rank) after `iterations` damped rounds (damping 85/100 in
    * integer arithmetic) over `edges` (src, dst) — deduplicated here,
    * so parallel edges count once.
    */
  def ranks(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(scale / n))
    val base = (scale * 15L / 100L) / n
    (1 to iterations).foreach { _ =>
      val sums = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
                (lit(base) + expr("coalesce(s, 0L) * 85 div 100")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
