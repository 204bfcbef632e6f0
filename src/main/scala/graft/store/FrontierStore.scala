package graft.store

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import graft.model.FrontierEntry

/** Per-bucket frontier storage — the bucketed-frontier half of the
  * round-3 scale rework (VERDICT round 2, item 1).
  *
  * The frontier is hash-bucketed by url_hash into `frontierBuckets`
  * compact binary files, tracked in the manifest exactly like the
  * filter shards (`frontierRounds`: bucket -> round whose file is
  * current; untouched buckets carry forward by reference, nothing is
  * copied). Consequences at 10^10 entries:
  *
  *   - the per-round frontier REWRITE is O(touched buckets), not
  *     O(|frontier|): drain-phase rounds that only move a few retries
  *     rewrite a handful of bucket files;
  *   - the candidate-exclusion anti-joins are GONE: exclusion happens
  *     inside the same per-bucket update task that rewrites the bucket,
  *     so the only exchange in the frontier-update path carries the
  *     round's DELTA (selected/blocked/retry/candidate rows) — the
  *     frontier itself never crosses a shuffle;
  *   - a resume at any parallelism reloads the same bucket files (the
  *     layout is keyed by hash bucket, not partition index), and each
  *     update task writes its own bucket's file executor-side with an
  *     atomic rename — same task-retry story as the filter shards.
  *
  * Entries inside a file are sorted by url_hash so file bytes are a
  * pure function of the set (deterministic across retries/runs).
  */
object FrontierStore {
  private val Magic = 0x47465231 // "GFR1"

  def serialize(entries: Array[FrontierEntry]): Array[Byte] = {
    val sorted = entries.sortBy(_.url_hash)
    val bos = new ByteArrayOutputStream(64 + entries.length * 96)
    val o = new DataOutputStream(bos)
    o.writeInt(Magic)
    o.writeInt(sorted.length)
    sorted.foreach { e =>
      o.writeUTF(e.url)
      o.writeUTF(e.url_hash)
      o.writeUTF(e.host)
      o.writeLong(e.host_hash)
      o.writeInt(e.salt)
      o.writeInt(e.priority)
      o.writeLong(e.discovery_time)
      o.writeInt(e.attempt)
      o.writeInt(e.round)
    }
    o.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Array[FrontierEntry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "corrupt frontier bucket file")
    val n = in.readInt()
    Array.fill(n) {
      FrontierEntry(in.readUTF(), in.readUTF(), in.readUTF(), in.readLong(),
                    in.readInt(), in.readInt(), in.readLong(), in.readInt(),
                    in.readInt())
    }
  }

  def write(root: String, round: Int, fb: Int,
            entries: Array[FrontierEntry]): Unit =
    Snapshots.writeBytesAt(Snapshots.frontierPathAt(root, round, fb),
                           serialize(entries))

  /** Fail-closed read: the manifest said this bucket's file is at
    * `round`, so an unreadable file must fail the round — defaulting to
    * an empty bucket would silently drop frontier entries.
    */
  def readRequired(root: String, round: Int, fb: Int): Array[FrontierEntry] =
    deserialize(
      Snapshots.requiredBytesAt(Snapshots.frontierPathAt(root, round, fb)))
}
