package graft.store

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg-style snapshot layout over plain parquet (no Iceberg runtime
  * jar ships in the sandbox — see SURVEY.md §7.0): every scheduling round
  * commits immutable parquet table directories plus one JSON manifest,
  * finalized by an atomic rename. `LATEST` (also atomic-renamed) points
  * at the newest manifest, giving snapshot isolation, time travel to any
  * round, and deterministic resume with per-partition lineage.
  *
  * Layout:
  * {{{
  *   <root>/r00003/{frontier,seen_delta,seen_full,docs,metrics,host_state,
  *                  robots,fetch_log}/  (parquet data files)
  *   <root>/r00003/filters/bucket-0007.bin       (cuckoo shard per host bucket)
  *   <root>/r00003/filters/bloom-0007.bin        (bloom shard per host bucket)
  *   <root>/manifests/m-00003.json               (atomic rename from .tmp)
  *   <root>/LATEST                               (atomic rename from .tmp)
  * }}}
  *
  * Scale note: seen is stored as per-round deltas plus a periodic full
  * compaction (`seenPaths` returns the minimal read set), so a resume
  * never rewrites the accumulated 10^10-row seen table; filters are
  * sharded by host_hash bucket, not by partition index, so a resume at a
  * different parallelism reloads the same shards.
  */
final class Snapshots(val root: String) {
  private def dir(round: Int) = f"$root/r$round%05d"
  def tablePath(round: Int, name: String): String = s"${dir(round)}/$name"
  def filterPath(round: Int, bucket: Int): String =
    Snapshots.filterPathAt(root, round, bucket)
  def bloomShardPath(round: Int, bucket: Int): String =
    Snapshots.bloomShardPathAt(root, round, bucket)
  private def manifestPath(round: Int) = f"$root/manifests/m-$round%05d.json"

  import Snapshots.Manifest

  def writeManifest(m: Manifest): Unit = {
    new File(s"$root/manifests").mkdirs()
    val json = JObject(
      "round" -> JInt(m.round),
      "parentRound" -> JInt(m.parentRound),
      "tables" -> JObject(m.tables.toList.map { case (k, v) => k -> JString(v) }),
      "seenDeltaRounds" -> JArray(m.seenDeltaRounds.map(r => JInt(r)).toList),
      "seenFullRound" -> JInt(m.seenFullRound),
      // bucket -> round whose shard files are current (untouched shards
      // reference their last-written round's files; nothing is copied
      // forward, so a round's commit cost is O(touched buckets))
      "filterRounds" -> JObject(m.filterRounds.toList.sortBy(_._1)
        .map { case (b, fr) => b.toString -> JInt(fr) }),
      // bucket -> round of its exact per-bucket seen index (tier 3);
      // maintained unconditionally, unlike filterRounds which drops a
      // bucket on cuckoo overflow
      "seenIndexRounds" -> JObject(m.seenIndexRounds.toList.sortBy(_._1)
        .map { case (b, ir) => b.toString -> JInt(ir) }),
      "counters" -> JObject(m.counters.toList.map { case (k, v) => k -> JLong(v) }),
      "done" -> JBool(m.done)
    )
    val tmp = Paths.get(manifestPath(m.round) + ".tmp")
    Files.writeString(tmp, JsonMethods.pretty(JsonMethods.render(json)))
    Files.move(tmp, Paths.get(manifestPath(m.round)),
               StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val lt = Paths.get(s"$root/LATEST.tmp")
    Files.writeString(lt, m.round.toString)
    Files.move(lt, Paths.get(s"$root/LATEST"),
               StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def latestRound: Option[Int] = {
    val p = Paths.get(s"$root/LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toInt) else None
  }

  def readManifest(round: Int): Manifest = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(Files.readString(Paths.get(manifestPath(round))))
    Manifest(
      round = (j \ "round").extract[Int],
      parentRound = (j \ "parentRound").extract[Int],
      tables = (j \ "tables").extract[Map[String, String]],
      seenDeltaRounds = (j \ "seenDeltaRounds").extract[Seq[Int]],
      seenFullRound = (j \ "seenFullRound").extract[Int],
      filterRounds = (j \ "filterRounds").extract[Map[String, Int]]
        .map { case (b, fr) => b.toInt -> fr },
      seenIndexRounds = (j \ "seenIndexRounds").extract[Map[String, Int]]
        .map { case (b, ir) => b.toInt -> ir },
      counters = (j \ "counters").extract[Map[String, Long]],
      done = (j \ "done").extract[Boolean]
    )
  }

  /** Minimal parquet read set reconstructing the exact seen table at
    * `m.round`: one optional compacted base + deltas after it.
    */
  def seenPaths(m: Manifest): Seq[String] = {
    val base =
      if (m.seenFullRound >= 0) Seq(tablePath(m.seenFullRound, "seen_full")) else Nil
    base ++ m.seenDeltaRounds.map(r => tablePath(r, "seen_delta"))
  }

  def writeFilter(round: Int, bucket: Int, bytes: Array[Byte]): Unit =
    Snapshots.writeBytesAt(filterPath(round, bucket), bytes)

  def readFilter(round: Int, bucket: Int): Option[Array[Byte]] =
    Snapshots.readBytesAt(filterPath(round, bucket))

  def writeBloomShard(round: Int, bucket: Int, bytes: Array[Byte]): Unit =
    Snapshots.writeBytesAt(bloomShardPath(round, bucket), bytes)

  def readBloomShard(round: Int, bucket: Int): Option[Array[Byte]] =
    Snapshots.readBytesAt(bloomShardPath(round, bucket))

  /** All docs table paths up to and including `round` (docs append per
    * round; the union is the full corpus).
    */
  def docsPaths(upToRound: Int): Seq[String] =
    (0 to upToRound).map(r => tablePath(r, "docs"))
      .filter(p => Files.exists(Paths.get(p)))

  def fetchLogPaths(upToRound: Int): Seq[String] =
    (0 to upToRound).map(r => tablePath(r, "fetch_log"))
      .filter(p => Files.exists(Paths.get(p)))

  def metricsPaths(upToRound: Int): Seq[String] =
    (0 to upToRound).map(r => tablePath(r, "metrics"))
      .filter(p => Files.exists(Paths.get(p)))
}

/** Static path/byte IO usable from inside executor tasks (shard
  * maintenance writes its own bucket's files executor-side — the driver
  * never transports filter bytes). On a real cluster `root` is shared
  * storage (S3/HDFS); per-file atomic rename makes task retries safe.
  */
object Snapshots {
  def filterPathAt(root: String, round: Int, bucket: Int): String =
    f"$root/r$round%05d/filters/bucket-$bucket%04d.bin"
  def bloomShardPathAt(root: String, round: Int, bucket: Int): String =
    f"$root/r$round%05d/filters/bloom-$bucket%04d.bin"
  def seenIndexPathAt(root: String, round: Int, bucket: Int): String =
    f"$root/r$round%05d/filters/seen-$bucket%04d.bin"

  def writeBytesAt(path: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp-" + Thread.currentThread().getId)
    Files.write(tmp, bytes)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
               StandardCopyOption.REPLACE_EXISTING)
  }

  def readBytesAt(path: String): Option[Array[Byte]] = {
    val p = Paths.get(path)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  final case class Manifest(
      round: Int,
      parentRound: Int,
      tables: Map[String, String],
      seenDeltaRounds: Seq[Int], // rounds whose seen_delta must be unioned
      seenFullRound: Int, // -1 = none; else base compaction round
      filterRounds: Map[Int, Int], // bucket -> round of its current shards
      seenIndexRounds: Map[Int, Int], // bucket -> round of its exact index
      counters: Map[String, Long],
      done: Boolean
  )
}
