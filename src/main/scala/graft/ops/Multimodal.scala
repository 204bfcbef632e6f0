package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.synthweb.SyntheticWeb.mix64

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, processed in batch-shaped
  * `mapPartitions` stages (the Scala analogue of `mapInPandas`: one
  * decoder instance per partition, rows streamed through it).
  *
  * The actual image/audio decode is STUBBED — no codec libraries ship
  * in this sandbox. [[FakeCodec]] is a deterministic stand-in that
  * "decodes" a seeded header from the bytes; a real implementation
  * (javacv / ImageIO / ffmpeg pipes) replaces exactly that object. The
  * Spark-side contract — schema, binary transport, partition-local
  * decoder lifecycle, deterministic frame sampling — is real and
  * tested.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, kind: String, bytes: Array[Byte])
  final case class ImageMeta(media_ref: String, width: Int, height: Int,
                             channels: Int, n_bytes: Long)
  final case class FrameSample(media_ref: String, frame_idx: Int,
                               frame_hash: Long)

  /** STUB decoder boundary. Real codecs implement this trait; the
    * deterministic fake derives metadata from a hash of the payload so
    * tests are stable and content-addressed.
    */
  trait Codec extends Serializable {
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int)
    def frameCount(bytes: Array[Byte]): Int
    def frameHash(bytes: Array[Byte], idx: Int): Long
  }

  object FakeCodec extends Codec {
    private def h(bytes: Array[Byte]): Long = {
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < bytes.length) { x = mix64(x ^ (bytes(i) & 0xffL)); i += 1 }
      x
    }
    override def imageMeta(bytes: Array[Byte]): (Int, Int, Int) = {
      val x = h(bytes)
      (64 + (math.abs(x) % 1857L).toInt, 64 + (math.abs(mix64(x)) % 1017L).toInt, 3)
    }
    override def frameCount(bytes: Array[Byte]): Int =
      8 + (math.abs(h(bytes)) % 120L).toInt
    override def frameHash(bytes: Array[Byte], idx: Int): Long =
      mix64(h(bytes) ^ idx.toLong)
  }

  /** Materialize a media table from crawled docs' media spans: bytes are
    * synthesized deterministically from the ref (the fetch-bytes stub).
    * Schema: (media_ref, kind, bytes binary).
    */
  def mediaTableFromDocs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(explode(col("spans")).as("s"))
      .filter(col("s.kind").isin("image", "video"))
      .select(col("s.media_ref").as("media_ref"), col("s.kind").as("kind"))
      .dropDuplicates("media_ref")
      .as[(String, String)]
      .map { case (ref, kind) =>
        // deterministic fake payload: 64-256 bytes seeded by the ref
        var x = mix64(ref.hashCode.toLong)
        val n = 64 + (math.abs(x) % 193L).toInt
        val bytes = new Array[Byte](n)
        var i = 0
        while (i < n) { x = mix64(x); bytes(i) = (x & 0xff).toByte; i += 1 }
        MediaRow(ref, kind, bytes)
      }
      .toDF()
  }

  /** Synthetic media table keyed by an id column of any DataFrame —
    * the "fetch media bytes" stub for testdata-driven pipelines: ref
    * and payload both derive deterministically from the id.
    */
  def syntheticMediaTable(spark: SparkSession, df: DataFrame,
                          idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .map { id =>
        val kind = if (id % 3 == 0) "video" else "image"
        val ext = if (kind == "video") "mp4" else "jpg"
        val ref = s"https://media.test/m-$id.$ext"
        var x = mix64(id ^ 0x5eedL)
        val n = 64 + (math.abs(x) % 193L).toInt
        val bytes = new Array[Byte](n)
        var i = 0
        while (i < n) { x = mix64(x); bytes(i) = (x & 0xff).toByte; i += 1 }
        MediaRow(ref, kind, bytes)
      }
      .toDF()
  }

  /** Image metadata extraction: one codec per partition, rows streamed
    * through (mapInPandas-shaped batch processing).
    */
  def imageMeta(spark: SparkSession, media: DataFrame,
                codec: Codec = FakeCodec): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_ref"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val c = codec // partition-local decoder instance
        it.map { case (ref, bytes) =>
          val (w, hh, ch) = c.imageMeta(bytes)
          ImageMeta(ref, w, hh, ch, bytes.length.toLong)
        }
      }
      .toDF()
  }

  /** Deterministic frame sampling from video payloads: every `everyN`th
    * frame, emitting a content hash per sampled frame.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyN: Int,
                   codec: Codec = FakeCodec): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_ref"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val c = codec
        it.flatMap { case (ref, bytes) =>
          val n = c.frameCount(bytes)
          (0 until n by everyN).iterator
            .map(i => FrameSample(ref, i, c.frameHash(bytes, i)))
        }
      }
      .toDF()
  }
}
