package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning}
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Eager local checkpoint that KEEPS a known hash partitioning.
  *
  * `Dataset.localCheckpoint` copies `executedPlan.outputPartitioning`
  * into the resulting `LogicalRDD` — but under AQE the executed plan is
  * an `AdaptiveSparkPlanExec`, whose `outputPartitioning` reports
  * `UnknownPartitioning` (the final plan is not bound at the time the
  * field is read), so every checkpoint silently drops the layout and
  * downstream same-key aggregations/joins re-exchange data that is
  * already placed correctly (verified empirically on 4.1: a
  * `repartition(n, col) → dropDuplicates → localCheckpoint →
  * groupBy(col)` chain plans a fresh Exchange).
  *
  * This shim materializes the frame exactly like `localCheckpoint(true)`
  * (row-copied, locally checkpointed, eagerly computed) and states the
  * partitioning the caller just established — valid whenever the plan
  * being checkpointed ends in an exchange/aggregate keyed on `keyCols`
  * with `numPartitions` partitions, which the caller asserts by
  * construction. Same package-shim pattern as [[GraftExprs]].
  */
object GraftCheckpoint {

  /** `df.localCheckpoint(eager = true)` whose result claims
    * `HashPartitioning(keyCols, numPartitions)`. The claim must be true
    * of the materialized RDD — callers pass the exact keys and count of
    * the `repartition` that produced `df`'s layout.
    */
  def localCheckpointKeepHash(df: DataFrame, keyCols: Seq[String],
                              numPartitions: Int): DataFrame = {
    val cdf = df.asInstanceOf[CDataFrame]
    val session = cdf.sparkSession
    val qe = cdf.queryExecution
    val rdd = qe.toRdd.map(_.copy()).localCheckpoint()
    rdd.count() // eager materialization (same contract as localCheckpoint(true))
    val output = qe.analyzed.output
    val keys = keyCols.map { k =>
      output.find(_.name == k).getOrElse(
        throw new IllegalArgumentException(
          s"checkpoint key $k not in output ${output.map(_.name)}"))
    }
    val part: Partitioning = HashPartitioning(keys, numPartitions)
    CDataset.ofRows(
      session,
      LogicalRDD(output, rdd, part, Nil, isStreaming = false)(session))
  }
}
