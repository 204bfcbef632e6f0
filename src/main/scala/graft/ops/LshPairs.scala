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

  /** Distinct (id_a, id_b) candidate pairs (id_a < id_b) from rows
    * sharing a (band, bucket), each bucket capped to its `cap` smallest
    * ids. `banded` needs columns (band, bucket, id), int/long-castable.
    */
  def cappedIdPairs(banded: DataFrame, cap: Int,
                    acc: Option[LongAccumulator] = None): DataFrame = {
    require(cap > 1, s"cap must be > 1, got $cap")
    val spark = banded.sparkSession
    import spark.implicits._
    val dropped = acc.getOrElse(
      spark.sparkContext.longAccumulator("lsh_capped_dropped_rows"))
    banded
      .select(col("band").cast("int"), col("bucket").cast("long"),
              col("id").cast("long"))
      .as[(Int, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (_: (Int, Long), it: Iterator[(Int, Long, Long)]) =>
        // the common bucket is tiny (a handful of ids): collect into a
        // flat buffer and only heapify ON overflow — allocating a
        // PriorityQueue for each of the ~|banded| groups was measurably
        // the hot spot. The overflow path is the same bounded max-heap
        // keeping the cap smallest ids, deterministic regardless of
        // shuffle arrival order.
        val buf = new mutable.ArrayBuffer[Long](4)
        var heap: mutable.PriorityQueue[Long] = null
        it.foreach { t =>
          if (heap == null) {
            buf += t._3
            if (buf.length > cap) {
              heap = mutable.PriorityQueue.empty[Long]
              heap ++= buf
              heap.dequeue() // shed the max back down to cap
              dropped.add(1L)
            }
          } else if (t._3 < heap.head) {
            heap.dequeue(); heap.enqueue(t._3); dropped.add(1L)
          } else dropped.add(1L)
        }
        val ids: scala.collection.Seq[Long] =
          if (heap == null) {
            val a = buf.toArray; java.util.Arrays.sort(a); a // ascending
          } else heap.dequeueAll.reverse // ascending
        ids.indices.iterator.flatMap { i =>
          (i + 1 until ids.length).iterator.map(j => (ids(i), ids(j)))
        }
      }
      .toDF("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }
}
