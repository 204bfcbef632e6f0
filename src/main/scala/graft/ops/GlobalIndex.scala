package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global consecutive row numbering under a total order — the
  * distributed primitive behind "assign every training example a
  * stable sequential id" (shard manifests, curriculum order, resume
  * cursors). A single-partition `row_number()` window serializes the
  * whole corpus through one task; this operator keeps full partition
  * parallelism.
  *
  * Plan: range-repartition on the sort keys + sort within partitions
  * (the same two steps a global ORDER BY plans), then ONE tiny job
  * counts rows per partition (partial-aggregated `spark_partition_id`
  * counts — numPartitions rows reach the driver), and a final
  * narrow codegen'd projection adds `offset(pid) + local index`
  * (decomposed from `monotonically_increasing_id`). Total
  * cost = one shuffle of the data (unavoidable for a total order) +
  * an O(numPartitions) metadata job; no single-task bottleneck at any
  * corpus size.
  *
  * The range-sorted frame is pinned with an eager `localCheckpoint`
  * so the count job and the numbering job see the SAME partitioning
  * and content (range partitioning samples its bounds; two separate
  * actions over an unpinned plan could disagree). On a real cluster
  * prefer `checkpoint()` with a reliable dir for fault tolerance —
  * same contract, durable lineage cut.
  *
  * Lifecycle note: the pinned copy lives in the block manager until
  * the returned frame's reference is dropped and the ContextCleaner
  * runs (driver GC). Callers invoking this repeatedly over large
  * frames should drop references between calls (and may System.gc()
  * to prompt cleanup) so stale copies don't crowd storage memory —
  * see the Bench hygiene leg.
  */
object GlobalIndex {

  /** `df` plus a `global_idx` column: 0-based consecutive rank of the
    * row under `sortCols` (ties broken by partition placement — pass a
    * key-complete sort to make the numbering fully deterministic).
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint()
    val counts = sorted.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    // monotonically_increasing_id() is (partition id << 33) | row index
    // within the partition — decomposing it gives offset(pid) + local
    // index as pure codegen'd arithmetic over the pinned frame, where
    // the former mapPartitions paid a full external-Row encode/decode
    // of every row (measured ~2s per million chunk-sized rows). The
    // pinned checkpoint fixes partition content and order, so the ids
    // decompose deterministically; same numbering as the old path.
    require(counts.values.forall(_ < (1L << 33)),
            s"a partition exceeds 2^33 rows; raise numPartitions ($numPartitions)")
    val offsets = new Array[Long](numPartitions)
    var acc = 0L
    (0 until numPartitions).foreach { p =>
      offsets(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    val mid = monotonically_increasing_id()
    val gid = element_at(lit(offsets), shiftrightunsigned(mid, 33).cast("int") + 1) +
      mid.bitwiseAND(lit((1L << 33) - 1))
    // coalesce pins nullable=false (element_at alone types as nullable;
    // the pid is always in range, so the fallback never fires) — the
    // output schema must stay identical to the former mapPartitions path
    sorted.withColumn("global_idx", coalesce(gid, lit(-1L)))
  }
}
