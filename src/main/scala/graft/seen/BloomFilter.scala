package graft.seen

import java.nio.ByteBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.canon.UrlCanon

/** Mergeable bloom filter over sha-256-hex URL hashes.
  *
  * The broadcast tier of the URL-seen set (SURVEY.md §2.5 A4): candidates
  * that miss the bloom are *definitely* new and skip the exact anti-join;
  * possible-positives go through the exact seen-table reconciliation.
  * Double hashing g_i = h1 + i·h2 where (h1, h2) are the first two 64-bit
  * words of the (already uniform) sha-256 key — no extra hashing needed.
  *
  * Spark's built-in `DataFrameStatFunctions.bloomFilter` exists but gives
  * no incremental, checkpointable snapshot; this one serializes to a flat
  * byte array written with each round's manifest and merges across
  * partitions/rounds.
  *
  * Scale note: at a 10^10-URL frontier a single 1%-fp bloom is ~12 GB —
  * too large to broadcast. The design shards filters by host_hash bucket
  * (see [[graft.store.Snapshots]]): each executor only needs the buckets
  * co-partitioned with it. In-sandbox the per-bucket filters are small
  * and the union is broadcastable; the sharding is what survives 1000×.
  */
final class BloomFilter(val numBits: Int, val numHashes: Int) extends Serializable {
  require(numBits % 64 == 0, "numBits must be a multiple of 64")
  val words = new Array[Long](numBits / 64)
  private[seen] var count = 0L

  def itemCount: Long = count

  def put(urlHashHex: String): Unit = {
    val (h1, h2) = UrlCanon.hexHashPair(urlHashHex)
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) % numBits) + numBits) % numBits
      words((bit / 64).toInt) |= (1L << (bit % 64))
      i += 1
    }
    count += 1
  }

  def mightContain(urlHashHex: String): Boolean = {
    val (h1, h2) = UrlCanon.hexHashPair(urlHashHex)
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) % numBits) + numBits) % numBits
      if ((words((bit / 64).toInt) & (1L << (bit % 64))) == 0L) return false
      i += 1
    }
    true
  }

  def merge(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes)
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    count += other.count
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + 4 + words.length * 8)
    bb.putLong(count).putInt(numBits).putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomFilter {
  /** Size for expected n items at target false-positive rate p. */
  def sized(expected: Long, fpp: Double): BloomFilter = {
    val m0 = math.ceil(-expected * math.log(fpp) / (math.log(2) * math.log(2)))
    // cap must stay a multiple of 64 (1<<30 bits = 128 MB per filter)
    val m = (((m0.toLong.max(64L) + 63) / 64) * 64).min(1L << 30).toInt
    val k = math.max(1, math.round((m.toDouble / expected.max(1)) * math.log(2)).toInt)
    new BloomFilter(m, k)
  }

  def deserialize(bytes: Array[Byte]): BloomFilter = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong
    val bits = bb.getInt
    val k = bb.getInt
    val f = new BloomFilter(bits, k)
    var i = 0
    while (i < f.words.length) { f.words(i) = bb.getLong; i += 1 }
    f.count = count
    f
  }

  /** Typed Aggregator building a bloom over a column of sha-256-hex URL
    * hashes in one distributed pass (partial aggregation map-side, merge
    * reduce-side — no collect of raw hashes to the driver).
    * Usage: ds.select(BloomFilter.agg(bits, k).toColumn)
    */
  def agg(numBits: Int, numHashes: Int): Aggregator[String, BloomFilter, Array[Byte]] =
    new Aggregator[String, BloomFilter, Array[Byte]] {
      override def zero: BloomFilter = new BloomFilter(numBits, numHashes)
      override def reduce(b: BloomFilter, a: String): BloomFilter = { b.put(a); b }
      override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = b1.merge(b2)
      override def finish(r: BloomFilter): Array[Byte] = r.serialize()
      override def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
}
