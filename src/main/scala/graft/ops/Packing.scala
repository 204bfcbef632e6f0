package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence/shard packing for training-data materialization: assign
  * each document to a contiguous token-budget shard within its group
  * (source domain, language, ...), deterministically.
  *
  * Rule: documents are laid out in `orderCol` order within each
  * `groupCol` partition; a document whose span starts at running token
  * offset `o` lands in shard `floor(o / budget)`. The assignment is a
  * pure function of the table contents — re-running on a re-shuffled
  * copy of the corpus yields byte-identical shard ids, which is what
  * makes resumable 100 TB materialization jobs possible.
  *
  * Scale shape: one hash-shuffle on `groupCol` and a sort within each
  * group (the window). Contiguous packing is inherently sequential
  * WITHIN a group — the parallel unit is the group, so callers pick a
  * `groupCol` with enough cardinality to spread (source/domain/lang
  * bucket); a single giant group would serialize into one task, which
  * is a property of the contract (contiguity), not the implementation.
  */
object Packing {

  /** `orderCol` should be unique within each group (q77 uses doc_id):
    * the prefix sum runs over a ROWS frame, so rows tied on `orderCol`
    * each get a distinct running total — the packing is structurally
    * valid for whichever tie order the partition produced, but that
    * order (and thus the tied rows' shard split) is not deterministic
    * across runs. With the default RANGE frame ties would instead ALL
    * receive the peak peer total and collapse into the same overfull
    * shard — silently wrong, which is why the frame is pinned here.
    */
  def tokenPack(df: DataFrame, groupCol: String, orderCol: String,
                tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("shard",
                  floor((col("cum_tokens") - col(tokensCol)) / lit(budget))
                    .cast("long"))
  }
}
