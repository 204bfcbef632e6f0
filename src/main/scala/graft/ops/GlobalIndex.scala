package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * narrow `mapPartitions` adds `offset(pid) + local index`. Total
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
    val offsets = new Array[Long](numPartitions)
    var acc = 0L
    (0 until numPartitions).foreach { p =>
      offsets(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    val outSchema = sorted.schema.add("global_idx", LongType, nullable = false)
    sorted.mapPartitions { rows =>
      val base = offsets(TaskContext.getPartitionId())
      rows.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (base + i))
      }
    }(Encoders.row(outSchema))
  }
}
