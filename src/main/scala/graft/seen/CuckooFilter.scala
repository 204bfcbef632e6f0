package graft.seen

import java.nio.ByteBuffer

import graft.canon.UrlCanon
import graft.synthweb.SyntheticWeb.mix64

/** Cuckoo filter: approximate membership with deletion support.
  *
  * The sharded middle tier of the URL-seen set: one filter per host_hash
  * bucket, persisted with each round's checkpoint and reloaded on resume
  * (keyed by bucket, NOT by partition index, so a repartitioned resume
  * still finds its shards — SURVEY.md §7.4.3).
  *
  * Standard design (Fan et al., CoNEXT'14, public): 4 slots/bucket,
  * 16-bit fingerprints, partial-key cuckoo hashing — i2 = i1 XOR
  * hash(fingerprint) — max 500 evictions before declaring full.
  * Deletability is what the bloom tier lacks: retry-exhausted tombstones
  * can be revoked (e.g. a host's robots rules change re-allowing URLs).
  */
final class CuckooFilter(val numBuckets: Int) extends Serializable {
  require((numBuckets & (numBuckets - 1)) == 0, "numBuckets must be a power of 2")
  private val SlotsPerBucket = 4
  private val MaxKicks = 500
  // fingerprints: 16 bits each, 0 = empty slot
  private[seen] val table = new Array[Short](numBuckets * SlotsPerBucket)
  private[seen] var size = 0L

  def itemCount: Long = size

  @inline private def fingerprint(h: Long): Short = {
    val f = ((h >>> 48) & 0xffff).toInt
    (if (f == 0) 1 else f).toShort
  }
  @inline private def bucketOf(h: Long): Int = (h & (numBuckets - 1)).toInt
  @inline private def altBucket(i: Int, fp: Short): Int =
    (i ^ (mix64(fp.toLong & 0xffffL) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  private def keyHash(urlHashHex: String): Long =
    UrlCanon.hexHashPair(urlHashHex)._1

  def put(urlHashHex: String): Boolean = {
    val h = keyHash(urlHashHex)
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    val i2 = altBucket(i1, fp)
    if (insertAt(i1, fp) || insertAt(i2, fp)) { size += 1; return true }
    // evict loop
    var i = if ((mix64(h) & 1L) == 0L) i1 else i2
    var f = fp
    var kicks = 0
    while (kicks < MaxKicks) {
      val slot = (mix64(h ^ kicks.toLong) & (SlotsPerBucket - 1)).toInt
      val idx = i * SlotsPerBucket + slot
      val old = table(idx)
      table(idx) = f
      f = old
      i = altBucket(i, f)
      if (insertAt(i, f)) { size += 1; return true }
      kicks += 1
    }
    false // filter full — caller falls back to the exact tier
  }

  private def insertAt(bucket: Int, fp: Short): Boolean = {
    val base = bucket * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  def mightContain(urlHashHex: String): Boolean = {
    val h = keyHash(urlHashHex)
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    if (containsAt(i1, fp)) return true
    containsAt(altBucket(i1, fp), fp)
  }

  private def containsAt(bucket: Int, fp: Short): Boolean = {
    val base = bucket * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) return true
      s += 1
    }
    false
  }

  def remove(urlHashHex: String): Boolean = {
    val h = keyHash(urlHashHex)
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    if (removeAt(i1, fp)) { size -= 1; return true }
    if (removeAt(altBucket(i1, fp), fp)) { size -= 1; return true }
    false
  }

  private def removeAt(bucket: Int, fp: Short): Boolean = {
    val base = bucket * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == fp) { table(base + s) = 0; return true }
      s += 1
    }
    false
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + table.length * 2)
    bb.putLong(size).putInt(numBuckets)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  /** Buckets for an expected load at ~95% occupancy, rounded up to a
    * power of two.
    */
  def sized(expected: Long): CuckooFilter = {
    val needed = math.max(16L, math.ceil(expected / (4 * 0.95)).toLong)
    var b = 16
    while (b < needed && b < (1 << 28)) b <<= 1
    new CuckooFilter(b)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getLong
    val buckets = bb.getInt
    val f = new CuckooFilter(buckets)
    var i = 0
    while (i < f.table.length) { f.table(i) = bb.getShort; i += 1 }
    f.size = size
    f
  }
}
