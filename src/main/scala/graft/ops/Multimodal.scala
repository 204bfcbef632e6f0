package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, processed in batch-shaped
  * `mapPartitions` stages (the Scala analogue of `mapInPandas`: one
  * decoder instance per partition, rows streamed through it).
  *
  * Decoding is REAL for every format a dependency-free JVM can handle:
  * PNG (IHDR), JPEG (SOF marker walk) and GIF (screen descriptor, frame
  * enumeration, full LZW pixel decode) via [[HeaderCodec]]. The one
  * remaining declared boundary: real video/audio containers (MP4/H.264
  * etc.) need native codecs that do not ship in this sandbox, so the
  * `video` kind is carried as animated GIF — a genuine multi-frame
  * container decoded for real. A javacv/ffmpeg-backed [[Codec]] slots
  * in for such containers on a cluster; the Spark-side contract —
  * schema, binary transport, partition-local decoder lifecycle,
  * deterministic frame sampling — is identical and tested here.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, kind: String, bytes: Array[Byte])
  final case class ImageMeta(media_ref: String, width: Int, height: Int,
                             channels: Int, n_bytes: Long)
  final case class FrameSample(media_ref: String, frame_idx: Int,
                               frame_hash: Long)
  final case class FrameProfile(media_ref: String, frame_idx: Int,
                                n_ink: Long, resized_hash: Long)

  /** Decoder boundary. [[HeaderCodec]] is the in-sandbox real
    * implementation; cluster deployments swap in a native-codec-backed
    * instance for container formats beyond PNG/JPEG/GIF.
    */
  trait Codec extends Serializable {
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int)
    def frameCount(bytes: Array[Byte]): Int
    def frameHash(bytes: Array[Byte], idx: Int): Long

    /** (frame_idx, hash) for frames 0, everyN, 2·everyN… Implementations
      * whose container parse is non-trivial override this to parse the
      * payload ONCE per row instead of once per sampled frame.
      */
    def sampleFrameHashes(bytes: Array[Byte], everyN: Int): Iterator[(Int, Long)] =
      (0 until frameCount(bytes) by everyN).iterator
        .map(i => (i, frameHash(bytes, i)))

    /** Feature-extract + resize over the DECODED pixels of frame `idx`:
      * (ink, resized_hash) where ink = count of nonzero palette indices
      * and resized_hash = [[MediaGen.pixelFold]] over a nearest-neighbor
      * resample to `dw` x `dh` in raster order — source pixel of target
      * (tx, ty) is (tx*w/dw, ty*h/dh), integer floor. The mapping is the
      * CONTRACT: oracles recompute both numbers from the pure pixel
      * functions without running the decoder.
      */
    def frameProfile(bytes: Array[Byte], idx: Int, dw: Int, dh: Int): (Long, Long)

    /** (frame_idx, ink, resized_hash) for frames 0, everyN, … — override
      * when the container parse is non-trivial (parse once per payload).
      */
    def profileFrames(bytes: Array[Byte], everyN: Int,
                      dw: Int, dh: Int): Iterator[(Int, Long, Long)] =
      (0 until frameCount(bytes) by everyN).iterator.map { i =>
        val (ink, rh) = frameProfile(bytes, i, dw, dh)
        (i, ink, rh)
      }
  }

  /** Deterministic payload for a media ref discovered in crawled docs —
    * the "fetch media bytes" stand-in (no network in-sandbox): videos
    * are animated GIFs, images alternate PNG/JPEG, all with
    * seed-derived dimensions ([[MediaGen]]'s pure parameter functions,
    * so oracles recompute expected metadata without parsing).
    */
  private[graft] def refPayload(ref: String, kind: String): Array[Byte] = {
    val seed = MediaGen.seedOfRef(ref)
    if (kind == "video") {
      val (w, h) = MediaGen.videoDims(seed)
      MediaGen.gif(w, h, MediaGen.frameCountOf(seed), seed)
    } else {
      val (w, h) = MediaGen.imageDims(seed)
      if ((seed & 1L) == 0L) MediaGen.png(w, h, alpha = (seed & 2L) == 0L)
      else MediaGen.jpeg(w, h)
    }
  }

  /** Materialize a media table from crawled docs' media spans: bytes
    * are synthesized deterministically from the ref (the fetch stub).
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
      .map { case (ref, kind) => MediaRow(ref, kind, refPayload(ref, kind)) }
      .toDF()
  }

  /** Synthetic media table keyed by an id column of any DataFrame —
    * the "fetch media bytes" stand-in for testdata-driven pipelines:
    * ref, format and payload all derive deterministically from the id
    * (id%3==0 video/GIF, id%3==1 PNG, id%3==2 JPEG).
    */
  def syntheticMediaTable(spark: SparkSession, df: DataFrame,
                          idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"))
      .as[Long]
      .map { id =>
        val seed = MediaGen.seedOfId(id)
        if (id % 3 == 0) {
          val (w, h) = MediaGen.videoDims(seed)
          MediaRow(s"https://media.test/m-$id.gif", "video",
                   MediaGen.gif(w, h, MediaGen.frameCountOf(seed), seed))
        } else {
          val (w, h) = MediaGen.imageDims(seed)
          if (id % 3 == 1)
            MediaRow(s"https://media.test/m-$id.png", "image",
                     MediaGen.png(w, h, alpha = id % 6 == 4))
          else
            MediaRow(s"https://media.test/m-$id.jpg", "image",
                     MediaGen.jpeg(w, h))
        }
      }
      .toDF()
  }

  /** Image metadata extraction: one codec per partition, rows streamed
    * through (mapInPandas-shaped batch processing).
    */
  def imageMeta(spark: SparkSession, media: DataFrame,
                codec: Codec = HeaderCodec): DataFrame = {
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
    * frame, emitting a content hash of the DECODED pixels per sampled
    * frame.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyN: Int,
                   codec: Codec = HeaderCodec): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_ref"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val c = codec
        it.flatMap { case (ref, bytes) =>
          c.sampleFrameHashes(bytes, everyN)
            .map { case (i, h) => FrameSample(ref, i, h) }
        }
      }
      .toDF()
  }

  /** Per-frame feature extraction + resize over video payloads: every
    * `everyN`th frame decodes once and emits (ink count, hash of the
    * nearest-neighbor `dw` x `dh` resample) — the resize/feature-extract
    * verbs of a training-data media stage, batch-shaped like
    * [[sampleFrames]] (one decoder per partition, one container parse
    * per payload).
    */
  def profileFrames(spark: SparkSession, media: DataFrame, everyN: Int,
                    dw: Int, dh: Int,
                    codec: Codec = HeaderCodec): DataFrame = {
    require(everyN > 0 && dw > 0 && dh > 0,
            s"positive everyN/dw/dh required, got ($everyN, $dw, $dh)")
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_ref"), col("bytes"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val c = codec
        it.flatMap { case (ref, bytes) =>
          c.profileFrames(bytes, everyN, dw, dh)
            .map { case (i, ink, rh) => FrameProfile(ref, i, ink, rh) }
        }
      }
      .toDF()
  }
}
