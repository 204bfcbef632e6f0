package graft.sched

import graft.seen.BloomFilter
import graft.store.Snapshots

/** Executor-local LRU of per-bucket bloom shards for the map-side
  * seen-set tier-1 check.
  *
  * The tier-1 check runs inside `mapPartitions` BEFORE any shuffle, so a
  * task may touch candidates from any host bucket. Each executor lazily
  * loads only the shards its tasks actually touch, straight from the
  * snapshot store (shared storage on a real cluster) — nothing is
  * broadcast through the driver. Entries are validated by (round, file
  * identity): the fileKey (inode) changes on every atomic-rename write,
  * so reusing an output directory for a fresh crawl in the same JVM
  * (round numbers repeat, contents differ) cannot serve a stale shard —
  * robust even on filesystems with coarse or zeroed mtimes. Callers
  * memoize per task (one validation stat per bucket per task, not per
  * row).
  *
  * Negative entries (no shard file for that round) are cached too —
  * readers treat a missing shard as "maybe seen" (the exact tier
  * resolves), and must not hit storage once per row to learn that.
  *
  * Eviction is size-bounded LRU (access-order LinkedHashMap): on
  * very-many-bucket configs it retires only the coldest shard instead
  * of cold-restarting every shard at once. Loads are rare (once per
  * bucket per task), so the coarse lock is off the per-row path.
  */
final class ShardLru(val maxEntries: Int) {
  private final case class Entry(round: Int, fileId: String,
                                 shard: Option[BloomFilter])
  private val cache =
    new java.util.LinkedHashMap[(String, Int), Entry](256, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Entry]): Boolean =
        size() > maxEntries
    }

  /** Identity of the file's current version: fileKey (inode) COMBINED
    * with mtime+size — the inode alone can be recycled by a
    * delete-and-rewrite, mtime alone can be coarse or zeroed; together a
    * stale hit needs both to collide. "" when absent/unstattable.
    */
  private def fileIdOf(path: String): String =
    try {
      val attrs = java.nio.file.Files.readAttributes(
        java.nio.file.Paths.get(path),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      s"${attrs.fileKey()}:${attrs.lastModifiedTime.toMillis}:${attrs.size}"
    } catch { case _: java.io.IOException => "" }

  def bloom(root: String, round: Int, bucket: Int): Option[BloomFilter] = {
    val path = Snapshots.bloomShardPathAt(root, round, bucket)
    val fileId = fileIdOf(path)
    val k = (root, bucket)
    val cur = cache.synchronized(cache.get(k))
    if (cur != null && cur.round == round && cur.fileId == fileId) cur.shard
    else {
      val loaded =
        if (fileId.isEmpty) None
        else Snapshots.readBytesAt(path).map(BloomFilter.deserialize)
      cache.synchronized(cache.put(k, Entry(round, fileId, loaded)))
      loaded
    }
  }

  def cachedCount: Int = cache.synchronized(cache.size())
}

/** The per-JVM (per-executor) instance the scheduler uses. */
object FilterShardCache {
  private val global = new ShardLru(8192)

  def bloom(root: String, round: Int, bucket: Int): Option[BloomFilter] =
    global.bloom(root, round, bucket)
}
