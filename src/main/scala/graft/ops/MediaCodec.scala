package graft.ops

import java.io.ByteArrayOutputStream

import graft.synthweb.SyntheticWeb.mix64

/** Real, dependency-free media parsing for the multimodal column
  * pipeline ([[Multimodal]]).
  *
  * [[HeaderCodec]] genuinely decodes the three formats a JVM can handle
  * without native codec libraries:
  *   - PNG: signature + IHDR (width, height, channels from color type)
  *   - JPEG: marker-segment walk to SOF0/1/2 (height, width, components)
  *   - GIF87a/89a: logical screen descriptor, frame enumeration over the
  *     block structure, and a full GIF-LZW decode of frame pixel data
  *     (frame hashes are computed over DECODED pixels, not raw bytes).
  *
  * The remaining declared stub boundary — narrowed from round 2's
  * whole-codec fake — is real video/audio containers (MP4/H.264, etc.),
  * which need native decoders that do not ship in this sandbox: the
  * `video` kind is carried as animated GIF, the one multi-frame
  * container that is fully decodable in pure JVM code. A
  * javacv/ffmpeg-backed [[Multimodal.Codec]] slots in for real
  * containers on a cluster; the Spark-side plumbing is identical.
  *
  * [[MediaGen]] emits minimal VALID payloads for the synthetic tables:
  * CRC-correct PNG chunks with deflated scanlines, structurally valid
  * JPEG marker segments, and animated GIFs whose LZW streams any
  * decoder can consume. Dimensions/frame counts/pixels are pure seeded
  * functions, so oracles can recompute the expected metadata WITHOUT
  * running the parser under test.
  */
object MediaGen {

  // ---- pure parameter functions (the oracle-visible ground truth) ----
  private def fm(x: Long, m: Int): Int = (((x % m) + m) % m).toInt

  def seedOfId(id: Long): Long = mix64(id ^ 0x5eedL)
  def seedOfRef(ref: String): Long = mix64(ref.hashCode.toLong)

  def imageDims(seed: Long): (Int, Int) =
    (16 + fm(mix64(seed ^ 0xa1L), 241), 16 + fm(mix64(seed ^ 0xa2L), 241))
  def videoDims(seed: Long): (Int, Int) =
    (8 + fm(mix64(seed ^ 0xb1L), 25), 8 + fm(mix64(seed ^ 0xb2L), 25))
  def frameCountOf(seed: Long): Int = 2 + fm(mix64(seed ^ 0xf1L), 12)

  /** Pixel (0/1, 2-color palette) at index `i` of frame `f`. */
  def pixel(seed: Long, f: Int, i: Int): Int =
    (mix64(seed ^ (f.toLong << 32) ^ i.toLong) & 1L).toInt

  /** The frame-content hash contract: fold over decoded pixel values in
    * raster order. [[HeaderCodec.frameHash]] computes this from the
    * DECODED LZW stream; oracles compute it straight from [[pixel]].
    */
  def pixelFold(pixels: Iterator[Int]): Long = {
    var x = 0x9e3779b97f4a7c15L
    var i = 0L
    pixels.foreach { p => x = mix64(x ^ ((i << 1) | p)); i += 1 }
    x
  }

  // ---- byte helpers ----
  private def be32(v: Int): Array[Byte] =
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] =
    Array[Byte]((v >>> 8).toByte, v.toByte)
  private def le16(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte)

  // ---- PNG: signature + IHDR + IDAT (zlib deflate) + IEND ----
  def png(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
              0, 8)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val body = tag.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    val colorType = if (alpha) 6 else 2
    val channels = if (alpha) 4 else 3
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))
    // scanlines: filter byte 0 + zeroed pixels (content is not under
    // test for stills; dims/channels are)
    val raw = new Array[Byte](h * (1 + w * channels))
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](8192)
    val idat = new ByteArrayOutputStream()
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    defl.end()
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---- JPEG: SOI, APP0/JFIF, DQT, SOF0, SOS, filler entropy, EOI ----
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def raw(bs: Int*): Unit = bs.foreach(out.write)
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      raw(0xff, marker)
      out.write(be16(payload.length + 2), 0, 2)
      out.write(payload, 0, payload.length)
    }
    raw(0xff, 0xd8) // SOI
    seg(0xe0, "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(16)) // DQT, table 0
    seg(0xc0, Array[Byte](8) ++ be16(h) ++ be16(w) ++ // SOF0: baseline
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // 3 components
    seg(0xda, Array[Byte](3, 1, 0, 2, 0, 3, 0, 0, 63, 0)) // SOS header
    raw(0x7f, 0x3c, 0x1e, 0x0f) // entropy filler (no 0xff bytes)
    raw(0xff, 0xd9) // EOI
    out.toByteArray
  }

  // ---- GIF89a: animated, 2-color global palette, per-frame LZW ----
  /** LSB-first bit packer for the GIF-LZW code stream. */
  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code << nBits
      nBits += width
      while (nBits >= 8) { out.write(acc & 0xff); acc >>>= 8; nBits -= 8 }
    }
    def bytes(): Array[Byte] = {
      if (nBits > 0) { out.write(acc & 0xff); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  def gif(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def raw(bs: Int*): Unit = bs.foreach(out.write)
    out.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    out.write(le16(w), 0, 2); out.write(le16(h), 0, 2)
    raw(0x80 | 0x70, 0, 0) // GCT present, size 2, max color resolution
    raw(0, 0, 0, 0xff, 0xff, 0xff) // palette: black, white
    val clear = 4 // minCodeSize 2 -> clear=4, eoi=5, width 3
    val eoi = 5
    var f = 0
    while (f < frames) {
      raw(0x21, 0xf9, 4, 0); out.write(le16(4), 0, 2); raw(0, 0) // GCE
      raw(0x2c); out.write(le16(0), 0, 2); out.write(le16(0), 0, 2)
      out.write(le16(w), 0, 2); out.write(le16(h), 0, 2); raw(0)
      raw(2) // LZW minimum code size
      // clear before every literal: the decoder's table never grows, so
      // the code width stays constant at 3 — a valid (uncompressed) LZW
      // stream any GIF decoder accepts
      val bw = new BitWriter
      var i = 0
      val n = w * h
      while (i < n) { bw.put(clear, 3); bw.put(pixel(seed, f, i), 3); i += 1 }
      bw.put(eoi, 3)
      val data = bw.bytes()
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        raw(len); out.write(data, off, len); off += len
      }
      raw(0) // block terminator
      f += 1
    }
    raw(0x3b) // trailer
    out.toByteArray
  }
}

/** The real decoder (see the object doc above for format coverage and
  * the declared MP4/audio boundary). Fails fast with a named error on
  * bytes it cannot parse — silent garbage metadata is worse than a
  * failed task.
  */
object HeaderCodec extends Multimodal.Codec {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
      u8(b, 6) == 0x1a && u8(b, 7) == 0x0a
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8
  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  override def imageMeta(bytes: Array[Byte]): (Int, Int, Int) =
    if (isPng(bytes)) {
      // first chunk must be IHDR: len(4) 'IHDR' w(4) h(4) depth colorType
      require(bytes.length >= 29 && new String(bytes, 12, 4, "US-ASCII") == "IHDR",
              "PNG without leading IHDR chunk")
      val w = be32(bytes, 16)
      val h = be32(bytes, 20)
      val channels = u8(bytes, 25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 3 // palette (indexes into RGB)
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case ct => throw new IllegalArgumentException(s"PNG color type $ct")
      }
      (w, h, channels)
    } else if (isJpeg(bytes)) {
      // marker-segment walk to the first SOF0/SOF1/SOF2
      var i = 2
      while (i + 3 < bytes.length) {
        require(u8(bytes, i) == 0xff, f"JPEG marker expected at $i")
        var m = u8(bytes, i + 1)
        while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(bytes, i + 1) }
        if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
          val h = be16(bytes, i + 5)
          val w = be16(bytes, i + 7)
          val nComp = u8(bytes, i + 9)
          return (w, h, nComp)
        }
        if (m == 0xd9 || m == 0xda)
          throw new IllegalArgumentException("JPEG without SOF before SOS/EOI")
        i += 2 + be16(bytes, i + 2) // skip this segment
      }
      throw new IllegalArgumentException("JPEG truncated before SOF")
    } else if (isGif(bytes)) {
      (le16(bytes, 6), le16(bytes, 8), 3) // palette-indexed RGB
    } else
      throw new IllegalArgumentException(
        s"unsupported media header: ${bytes.take(4).map(b => f"${b & 0xff}%02x").mkString(" ")}")

  /** GIF frame boundaries: (lzwMinCodeSize, concatenated data
    * sub-blocks, frame width, frame height). One entry per image
    * descriptor.
    */
  private def gifFrames(b: Array[Byte]): Vector[(Int, Array[Byte], Int, Int)] = {
    require(isGif(b), "not a GIF")
    var i = 10
    val packed = u8(b, i)
    i += 3 // packed, bg color, aspect
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 0x07) + 1)) // GCT
    val frames = Vector.newBuilder[(Int, Array[Byte], Int, Int)]
    def skipSubBlocks(): Unit = {
      while (u8(b, i) != 0) i += 1 + u8(b, i)
      i += 1
    }
    var done = false
    while (!done && i < b.length) {
      u8(b, i) match {
        case 0x3b => done = true
        case 0x21 => i += 2; skipSubBlocks() // extension: label + blocks
        case 0x2c =>
          val fw = le16(b, i + 5)
          val fh = le16(b, i + 7)
          val fPacked = u8(b, i + 9)
          i += 10
          if ((fPacked & 0x80) != 0) i += 3 * (1 << ((fPacked & 0x07) + 1))
          val minCode = u8(b, i); i += 1
          val data = new ByteArrayOutputStream()
          while (u8(b, i) != 0) {
            val len = u8(b, i)
            data.write(b, i + 1, len)
            i += 1 + len
          }
          i += 1
          frames += ((minCode, data.toByteArray, fw, fh))
        case other =>
          throw new IllegalArgumentException(f"GIF block 0x$other%02x at $i")
      }
    }
    frames.result()
  }

  /** Standard GIF-LZW decode of one frame's code stream. */
  private[ops] def lzwDecode(minCode: Int, data: Array[Byte],
                             nPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Int](nPixels)
    var outN = 0
    // dictionary of sequences; literals are single-pixel
    var dict = scala.collection.mutable.ArrayBuffer.tabulate(eoi + 1)(
      c => if (c < clear) Array(c) else null)
    var width = minCode + 1
    var prev: Array[Int] = null
    var acc = 0L
    var nBits = 0
    var i = 0
    while (i < data.length || nBits >= width) {
      while (nBits < width && i < data.length) {
        acc |= (data(i) & 0xffL) << nBits; nBits += 8; i += 1
      }
      if (nBits < width) return java.util.Arrays.copyOf(out, outN)
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nBits -= width
      if (code == clear) {
        dict = scala.collection.mutable.ArrayBuffer.tabulate(eoi + 1)(
          c => if (c < clear) Array(c) else null)
        width = minCode + 1
        prev = null
      } else if (code == eoi) {
        return java.util.Arrays.copyOf(out, outN)
      } else {
        val entry =
          if (code < dict.length && dict(code) != null) dict(code)
          else if (code == dict.length && prev != null) prev :+ prev(0)
          else throw new IllegalArgumentException(s"bad LZW code $code")
        var j = 0
        while (j < entry.length && outN < nPixels) {
          out(outN) = entry(j); outN += 1; j += 1
        }
        if (prev != null) dict += (prev :+ entry(0))
        if (dict.length == (1 << width) && width < 12) width += 1
        prev = entry
      }
    }
    java.util.Arrays.copyOf(out, outN)
  }

  override def frameCount(bytes: Array[Byte]): Int =
    if (isGif(bytes)) gifFrames(bytes).size
    else if (isPng(bytes) || isJpeg(bytes)) 1
    else throw new IllegalArgumentException("unsupported media for frameCount")

  override def frameHash(bytes: Array[Byte], idx: Int): Long =
    if (isGif(bytes)) {
      val fs = gifFrames(bytes)
      require(idx >= 0 && idx < fs.size, s"frame $idx of ${fs.size}")
      hashFrame(fs(idx))
    } else {
      require(idx == 0, "single-frame format")
      MediaGen.pixelFold(bytes.iterator.map(_ & 1))
    }

  private def hashFrame(f: (Int, Array[Byte], Int, Int)): Long =
    MediaGen.pixelFold(lzwDecode(f._1, f._2, f._3 * f._4).iterator)

  /** Decode + profile one frame: ink = nonzero pixel count; resized
    * hash = pixelFold over the nearest-neighbor resample (the mapping
    * contract in [[Multimodal.Codec.frameProfile]]'s doc).
    */
  private def profileOf(f: (Int, Array[Byte], Int, Int),
                        dw: Int, dh: Int): (Long, Long) = {
    val (minCode, data, fw, fh) = f
    val px = lzwDecode(minCode, data, fw * fh)
    var ink = 0L
    var i = 0
    while (i < px.length) { if (px(i) != 0) ink += 1; i += 1 }
    val resized = (0 until dh).iterator.flatMap { ty =>
      val sy = ty * fh / dh
      (0 until dw).iterator.map { tx => px(sy * fw + tx * fw / dw) }
    }
    (ink, MediaGen.pixelFold(resized))
  }

  override def frameProfile(bytes: Array[Byte], idx: Int,
                            dw: Int, dh: Int): (Long, Long) =
    if (isGif(bytes)) {
      val fs = gifFrames(bytes)
      require(idx >= 0 && idx < fs.size, s"frame $idx of ${fs.size}")
      profileOf(fs(idx), dw, dh)
    } else
      throw new IllegalArgumentException(
        "frameProfile needs a decodable multi-frame container (GIF here; " +
          "native-codec-backed Codec for real video on a cluster)")

  /** One container parse per payload (see sampleFrameHashes). */
  override def profileFrames(bytes: Array[Byte], everyN: Int,
                             dw: Int, dh: Int): Iterator[(Int, Long, Long)] =
    if (isGif(bytes)) {
      val fs = gifFrames(bytes)
      (0 until fs.size by everyN).iterator.map { i =>
        val (ink, rh) = profileOf(fs(i), dw, dh)
        (i, ink, rh)
      }
    } else super.profileFrames(bytes, everyN, dw, dh)

  /** One container parse per payload (the default trait impl would
    * re-walk + re-copy every frame's sub-blocks once per sampled frame).
    */
  override def sampleFrameHashes(bytes: Array[Byte],
                                 everyN: Int): Iterator[(Int, Long)] =
    if (isGif(bytes)) {
      val fs = gifFrames(bytes)
      (0 until fs.size by everyN).iterator.map(i => (i, hashFrame(fs(i))))
    } else super.sampleFrameHashes(bytes, everyN)
}
