package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Capped within-bucket candidate-pair generation, shared by the LSH
  * dedup/similarity family ([[Dedup.minhashNearDups]],
  * [[Dedup.simhashNearDups]], [[Similarity.cosineNearDups]]).
  *
  * LSH self-joins explode quadratically on a pathological bucket: a
  * corpus that is mostly near-identical (exactly the input near-dup
  * removal exists for) lands m rows in one (band, bucket) and would
  * yield m² candidate pairs in one task. [[cappedIdPairs]] bounds every
  * bucket to its `cap` smallest ids — deterministic, O(cap) task
  * memory, O(cap²) task output — and counts the rows it drops in a
  * named `LongAccumulator` (visible in the Spark UI and to callers), so
  * truncation is never silent — standard accumulator semantics apply:
  * task retries and repeated actions over an un-cached result re-add
  * their counts, so read it as a saw-truncation indicator and upper
  * bound, not an exact tally. A row dropped from one oversized bucket
  * can still pair through its other bands/tables, so recall degrades
  * gracefully instead of the job dying.
  *
  * The input carries (band, bucket, id) ONLY: fat payloads (shingle
  * arrays, embeddings) must be joined back per surviving candidate
  * pair by the caller — never replicated bands× through this exchange.
  */
object LshPairs {

  /** Broadcast `df` only when `rows * bytesPerRow` fits the session's
    * autoBroadcastJoinThreshold, else return it unhinted — the measured
    * -count guard the incremental indexes use for their verify joins,
    * shared here for every pair/id side whose real size is known from a
    * materialized count. A checkpointed frame has no catalyst size
    * estimate, so without the hint the planner assumes it is huge and
    * shuffles the (possibly fat) other side.
    */
  private[graft] def broadcastIfFits(df: DataFrame, rows: Long,
                                     bytesPerRow: Long): DataFrame = {
    val bcLimit = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (bcLimit > 0 && rows * bytesPerRow <= bcLimit) broadcast(df) else df
  }

  /** Distinct (id_a, id_b) candidate pairs (id_a < id_b) from rows
    * sharing a (band, bucket), each bucket capped to its `cap` smallest
    * ids. `banded` needs columns (band, bucket, id), int/long-castable.
    *
    * `matchTag`: when true, `banded` must additionally carry a long
    * `tag` column and a pair is emitted only when both members' tags
    * are EQUAL. This is the in-generation form of the exact-dup
    * signature prefilter (tag = a hash of the full minhash signature):
    * at verification threshold 1.0 a pair with differing signatures
    * cannot verify, and suppressing it here keeps the pair set at the
    * true-duplicate scale instead of the O(bucket²) candidate scale —
    * the dedup family's dominant cost on near-dup-heavy corpora. Tag
    * collisions only ADD candidates (removed by the caller's exact
    * verification); capping semantics are untouched — the cap keeps the
    * same smallest-id bucket members regardless of tags.
    */
  def cappedIdPairs(banded: DataFrame, cap: Int,
                    acc: Option[LongAccumulator] = None,
                    matchTag: Boolean = false): DataFrame = {
    require(cap > 1, s"cap must be > 1, got $cap")
    val spark = banded.sparkSession
    import spark.implicits._
    val dropped = acc.getOrElse(
      spark.sparkContext.longAccumulator("lsh_capped_dropped_rows"))
    val withTag = banded
      .select(col("band").cast("int"), col("bucket").cast("long"),
              col("id").cast("long"),
              (if (matchTag) col("tag").cast("long") else lit(0L)).as("tag"))
      .as[(Int, Long, Long, Long)]
    withTag
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (_: (Int, Long), it: Iterator[(Int, Long, Long, Long)]) =>
        // the common bucket is tiny (a handful of ids): collect into a
        // flat buffer and only heapify ON overflow — allocating a
        // PriorityQueue for each of the ~|banded| groups was measurably
        // the hot spot. The overflow path is the same bounded max-heap
        // keeping the cap smallest ids (ordering on id alone, tags ride
        // along), deterministic regardless of shuffle arrival order.
        implicit val ord: Ordering[(Long, Long)] = Ordering.by(_._1)
        val buf = new mutable.ArrayBuffer[(Long, Long)](4)
        var heap: mutable.PriorityQueue[(Long, Long)] = null
        it.foreach { t =>
          val e = (t._3, t._4)
          if (heap == null) {
            buf += e
            if (buf.length > cap) {
              heap = mutable.PriorityQueue.empty[(Long, Long)]
              heap ++= buf
              heap.dequeue() // shed the max back down to cap
              dropped.add(1L)
            }
          } else if (e._1 < heap.head._1) {
            heap.dequeue(); heap.enqueue(e); dropped.add(1L)
          } else dropped.add(1L)
        }
        val ids: scala.collection.Seq[(Long, Long)] =
          if (heap == null) {
            val a = buf.toArray; java.util.Arrays.sort(a, ord); a // ascending
          } else heap.dequeueAll.reverse // ascending
        ids.indices.iterator.flatMap { i =>
          (i + 1 until ids.length).iterator
            .filter(j => ids(i)._2 == ids(j)._2) // tags equal (0 == 0 untagged)
            .map(j => (ids(i)._1, ids(j)._1))
        }
      }
      .toDF("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }
}
