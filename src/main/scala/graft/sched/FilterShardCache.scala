package graft.sched

import java.util.concurrent.ConcurrentHashMap

import graft.seen.BloomFilter
import graft.store.Snapshots

/** Executor-local cache of per-bucket bloom shards for the map-side
  * seen-set tier-1 check.
  *
  * The tier-1 check runs inside `mapPartitions` BEFORE any shuffle, so a
  * task may touch candidates from any host bucket. Each executor lazily
  * loads only the shards its tasks actually touch, straight from the
  * snapshot store (shared storage on a real cluster) — nothing is
  * broadcast through the driver. Shards are immutable per (bucket,
  * round), so the cache key is exact; a bucket's entry is replaced when
  * a later round's shard is requested.
  *
  * Negative entries (no shard file for that round) are cached too —
  * readers treat a missing shard as "maybe seen" (the exact tier
  * resolves), and must not hit storage once per row to learn that.
  */
object FilterShardCache {
  // (root, bucket) -> (round, Option[shard])
  private val cache =
    new ConcurrentHashMap[(String, Int), (Int, Option[BloomFilter])]()

  def bloom(root: String, round: Int, bucket: Int): Option[BloomFilter] = {
    val k = (root, bucket)
    val cur = cache.get(k)
    if (cur != null && cur._1 == round) cur._2
    else {
      val loaded = Snapshots
        .readBytesAt(Snapshots.bloomShardPathAt(root, round, bucket))
        .map(BloomFilter.deserialize)
      if (cache.size > 8192) cache.clear() // crude bound; shards are tiny
      cache.put(k, (round, loaded))
      loaded
    }
  }
}
