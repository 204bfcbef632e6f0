package graft.oracle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.fetch.{Fetcher, SimulatedFetcher}
import graft.model.{FetchLogEntry, FrontierEntry}
import graft.ops.{FacetSplit, Fingerprint64, HashOps, MediaGen, Multimodal, Similarity}
import graft.parse.HtmlSpans
import graft.synthweb.SyntheticWeb.hashOf

/** Sequential, single-threaded oracle recomputations for the driver's
  * DuckDB correctness gate.
  *
  * Queries whose semantics DuckDB cannot express natively (the crawl
  * pipeline, custom sketch/ANN expressions, the real PNG/JPEG/GIF
  * decode) are oracled by an INDEPENDENT sequential computation: plain
  * Scala loops over collected inputs, sharing only the primitive pure
  * functions under test's contract (token/plane hashes, the codec
  * primitives, the synthetic web). [[graft.Verify]] calls [[writeAll]] after the
  * query dump; each expected table lands as one parquet file under
  * `/tmp/graft_oracle/<query>/`, and the corresponding
  * `SparkEntry.oracleSql` entry reads it back with DuckDB's
  * `read_parquet` — so the driver's row/schema/hash compare runs
  * between the distributed result and the sequential recomputation,
  * through a third engine.
  *
  * `OracleDumpSpec` asserts schema and row equality between every dump
  * and its Spark query in-suite, so a drift fails `sbt test` before it
  * fails the driver gate.
  */
object SeqOracles {

  /** Default dump root — a PLACEHOLDER in the static `oracleSql`
    * strings. [[graft.Verify]] dumps under its own outDir (guaranteed
    * readable wherever the driver's DuckDB compare runs, since the
    * query parquets are read from there too) and rewrites the
    * placeholder to the actual path in the emitted oracle_sql.json.
    */
  val root = "/tmp/graft_oracle"

  /** DuckDB SQL reading a dumped expected table back in a fixed order. */
  def dumpSql(name: String, orderBy: String): String =
    s"SELECT * FROM read_parquet('$root/$name/*.parquet') ORDER BY $orderBy"

  private def write(dumpRoot: String, name: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dumpRoot/$name")

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** TextOps.words tokenization, sequentially. */
  private def tokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  // ------------------------------------------------------------------
  // row shapes (must mirror the Spark queries' output schemas exactly;
  // OracleDumpSpec pins the equality)
  // ------------------------------------------------------------------
  final case class Q50Row(doc_id: String, url: String, host: String,
                          round: Int, n_spans: Int)
  final case class Q52Row(doc_id: String, offset: Int, kind: String,
                          text: String, media_ref: String)
  final case class Q28Row(id_a: Long, id_b: Long, hamming: Int)
  final case class Q32Row(doc_id: Long, fp64: Long, quality: Double)
  final case class Q35Row(query_id: Long, neighbor_id: Long, sim: Double)
  final case class Q43Row(doc_id: String, job_id: Long, title: String,
                          company: String, min_salary: Long,
                          max_salary: Long, posted_ts: String)
  final case class Q44Row(host: String, phone: String, n_docs: Long)
  final case class Q61Row(user_id: Long, status: Long, phone: String)
  final case class Q45Row(id: String, count: Long, depth: Int, settled: Boolean)
  final case class Q64Row(host: String, n_fetches: Long, n_ok: Long,
                          first_ts: java.sql.Timestamp,
                          last_ts: java.sql.Timestamp)

  // ------------------------------------------------------------------
  // crawl-derived (q50-q52 dumps; q53 aggregates q51's dump in SQL)
  // ------------------------------------------------------------------
  private def crawlDumps(spark: SparkSession, dumpRoot: String): Unit = {
    import spark.implicits._
    val cfg = graft.SparkEntry.CrawlOnce.cfg("oracle-unused")
    val o = new CrawlOracle(cfg).run()

    val q50 = o.docs.values.toSeq
      .map(d => Q50Row(d.doc_id, d.url, d.host, d.round, d.spans.size))
      .sortBy(_.doc_id)
    write(dumpRoot, "q50_crawl_docs", q50.toDF())

    val q51: Seq[FetchLogEntry] =
      o.fetchLog.sortBy(e => (e.round, e.host_hash, e.seq))
    write(dumpRoot, "q51_crawl_fetch_log", q51.toDF())

    // q93: the SAME web crawled rank-priority-ordered — the sequential
    // oracle recomputes the integer PageRank stamp in plain loops
    // (CrawlOracle.seqRanks), so the distributed run must match
    // bit-for-bit by determinism
    val oRank = new CrawlOracle(cfg.copy(rankPriority = true)).run()
    write(dumpRoot, "q93_rank_crawl_log",
          oRank.fetchLog.sortBy(e => (e.round, e.host_hash, e.seq)).toDF())

    val q52 = o.docs.values.toSeq
      .flatMap(d => d.spans.map(s =>
        Q52Row(d.doc_id, s.offset, s.kind, s.text, s.media_ref)))
      .sortBy(r => (r.doc_id, r.offset))
    write(dumpRoot, "q52_crawl_spans", q52.toDF())

    // q39: media refs from the oracle's docs. Expected dims/channels are
    // recomputed from MediaGen's PURE parameter functions — the oracle
    // never runs the header parser under test, so an encode/parse bug on
    // either side breaks the compare. Only the byte LENGTH re-runs the
    // payload generator (it depends on deflate/LZW output size).
    val q39 = o.docs.values.toSeq
      .flatMap(_.spans.filter(s => s.kind == "image" || s.kind == "video"))
      .map(s => (s.media_ref, s.kind)).distinct
      .filter(_._2 == "image")
      .map { case (ref, _) =>
        val seed = MediaGen.seedOfRef(ref)
        val (w, h) = MediaGen.imageDims(seed)
        val ch = if ((seed & 1L) == 0L) { if ((seed & 2L) == 0L) 4 else 3 }
                 else 3
        Multimodal.ImageMeta(ref, w, h, ch,
                             Multimodal.refPayload(ref, "image").length.toLong)
      }
      .sortBy(_.media_ref)
    write(dumpRoot, "q39_media_from_crawl", q39.toDF())

    // q43: sequential re-fetch of the oracle's detail pages, tokenizer
    // parse, driver-side JSON extraction (json4s, not Spark's from_json)
    val fetcher = SimulatedFetcher(cfg.web)
    implicit val fmts: Formats = DefaultFormats
    val tsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val q43 = o.docs.values.toSeq
      .filter(_.url.contains("/item/"))
      .flatMap { d =>
        val body = fetcher.fetch(
          FrontierEntry(d.url, d.doc_id, "", 0L, 0, 2, 0L, 9, 0)).body
        HtmlSpans.parse(d.url, body).scripts
          .find(_._1.get("id").contains("__NEXT_DATA__")).map(_._2)
          .flatMap { script =>
            val job = JsonMethods.parse(script) \ "props" \ "pageProps" \ "job"
            (job \ "id").toOption.map { _ =>
              val postedMs = (job \ "posted_ms").extract[Long]
              Q43Row(d.doc_id, (job \ "id").extract[Long],
                     (job \ "title").extract[String],
                     (job \ "organization" \ "name").extract[String],
                     (job \ "min_salary").extract[Long],
                     (job \ "max_salary").extract[Long],
                     tsFmt.format(java.time.Instant.ofEpochSecond(postedMs / 1000)))
            }
          }
      }
      .sortBy(_.doc_id)
    write(dumpRoot, "q43_next_data_extract", q43.toDF())

    // q61: user ids from the oracle's detail docs -> the credentialed
    // phone API's expected answers, computed from the pure phone/token
    // functions directly (no AuthedApiClient, no JSON parsing — the
    // expected body fields are reconstructed independently)
    val q61 = o.docs.values.toSeq
      .filter(_.url.contains("/item/"))
      .map(d => d.url.substring(d.url.lastIndexOf('-') + 1).toLong % 1000L)
      .distinct.sorted
      .map(uid => Q61Row(uid, 200L,
                         graft.synthweb.SyntheticWeb.phoneOf(cfg.web, uid.toString)))
    write(dumpRoot, "q61_auth_enrich", q61.toDF())

    // q44: host -> deterministic phone lookup + doc counts
    val q44 = o.docs.values.toSeq.groupBy(_.host).toSeq
      .map { case (h, ds) =>
        Q44Row(h, f"+62-${math.abs(hashOf(77L, h)) % 1000000000L}%09d",
               ds.size.toLong)
      }
      .sortBy(_.host)
    write(dumpRoot, "q44_enrich_join", q44.toDF())
  }

  // ------------------------------------------------------------------
  // testdata-derived dumps
  // ------------------------------------------------------------------
  private def simhash64Seq(ws: Array[String]): Long = {
    val votes = new Array[Int](64)
    ws.foreach { w =>
      val h = HashOps.tokenHash(UTF8String.fromString(w))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  private def q28Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    // all-pairs hamming over the planted corpus: for maxHamming=3 the
    // 4x16-bit pigeonhole banding is EXACT, so the banded operator must
    // equal this full quadratic scan
    val rows = graft.SparkEntry.dedupCorpus(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1)
    val sigs = rows.map { case (id, text) => (id, simhash64Seq(tokens(text))) }
    val pairs = for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield Q28Row(sigs(i)._1, sigs(j)._1, h)
    write(dumpRoot, "q28_simhash",
          pairs.toVector.sortBy(p => (p.id_a, p.id_b)).toDF())
  }

  /** Independent sequential recomputation of TextOps.quality_score
    * (same published formula, plain Scala ops, same intermediate
    * rounding points).
    */
  private def qualitySeq(text: String): Double = {
    val stops = Set("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")
    val len = text.length
    val lenScore = math.min(len / 500.0, 1.0)
    val punct = text.count(ch => """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".contains(ch))
    val punctScore = math.max(1.0 - round4(punct.toDouble / math.max(len, 1)) * 5.0, 0.0)
    val ws = tokens(text)
    val nw = math.max(ws.length, 1)
    val stopScore = math.min(round4(ws.count(stops).toDouble / nw) * 5.0, 1.0)
    val meanWlen = round4(ws.map(_.length.toLong).sum.toDouble / nw)
    val wlenScore = if (meanWlen >= 3.0 && meanWlen <= 10.0) 1.0 else 0.5
    round4(lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wlenScore * 0.2)
  }

  private def q32Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val out = rows.map { case (id, text) =>
      Q32Row(id, Fingerprint64(text), qualitySeq(text))
    }
    write(dumpRoot, "q32_fingerprint", out.toSeq.toDF())
  }

  /** Sequential LSH ANN with the same (tables=8, bits=10, probes=4,
    * k=5) parameters as q35: plain loops over the collected embedding
    * table, sharing only the plane-hash and cosine primitives.
    */
  private def q35Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val (tables, bits, probes, k, seed) = (8, 10, 4, 5, 42L)
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val queryIds = (0L until 10L).toSet
    val sigs: Map[Long, Array[Int]] = all.map { case (id, v) =>
      id -> Array.tabulate(tables)(t => Similarity.signatureAt(v, seed, t, bits))
    }.toMap
    val out = all.filter(t => queryIds.contains(t._1)).sortBy(_._1).flatMap {
      case (q, qv) =>
        val probeSets: Array[Set[Int]] = Array.tabulate(tables) { t =>
          val b = sigs(q)(t)
          (b +: (0 until probes).map(i => b ^ (1 << i))).toSet
        }
        val cands = all.iterator
          .filter(c => !queryIds.contains(c._1))
          .filter(c => (0 until tables).exists(t => probeSets(t).contains(sigs(c._1)(t))))
          .map(c => (c._1, Similarity.cosine(qv, c._2)))
          .toVector
        cands.sortBy(c => (-c._2, c._1)).take(k)
          .map { case (id, sim) => Q35Row(q, id, round4(sim)) }
    }
    val sorted = out.sortBy(r => (r.query_id, -r.sim, r.neighbor_id))
    write(dumpRoot, "q35_ann_lsh", sorted.toSeq.toDF())
  }

  /** Shared sequential IVF probe + exact re-rank used by the q57 and
    * q68 oracles (previously duplicated verbatim — a tie-break or
    * rounding fix to one copy would have silently missed the other).
    * Queries are ids 0..9; k nearest non-query vectors from the probed
    * cells, ties broken by id, sims rounded like the engine output.
    */
  private def ivfProbeTopK(all: Array[(Long, Array[Float])],
                           centroids: Array[Array[Float]],
                           cellOf: Map[Long, Int], nProbe: Int,
                           k: Int): Array[Q35Row] = {
    val queryIds = (0L until 10L).toSet
    all.filter(t => queryIds.contains(t._1)).flatMap { case (q, qv) =>
      val probes = Similarity.probeCells(qv, centroids, nProbe).toSet
      all.iterator
        .filter(t => !queryIds.contains(t._1) && probes.contains(cellOf(t._1)))
        .map(t => (t._1, Similarity.cosine(qv, t._2)))
        .toVector
        .sortBy(c => (-c._2, c._1)).take(k)
        .map { case (id, sim) => Q35Row(q, id, round4(sim)) }
    }
  }

  /** Sequential IVF ANN with q57's parameters: the cell assignment,
    * probing and re-ranking loops re-done in plain Scala over the
    * collected table, sharing only the geometry primitives (kmeans runs
    * driver-side in both paths and is identical by construction).
    */
  private def q57Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val (nCells, nProbe, k, seed, sampleN, iters) = (16, 4, 5, 42L, 512, 8)
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val centroids =
      Similarity.kmeans(all.take(sampleN).map(_._2), nCells, iters, seed)
    val cellOf: Map[Long, Int] =
      all.map { case (id, v) => id -> Similarity.nearestCell(v, centroids) }.toMap
    val out = ivfProbeTopK(all, centroids, cellOf, nProbe, k)
    write(dumpRoot, "q57_ann_ivf",
          out.sortBy(r => (r.query_id, -r.sim, r.neighbor_id)).toSeq.toDF())
  }

  /** Sequential oracle for q68's persisted-IVF-index lifecycle. With
    * retrainEvery=2 and 3 ingest rounds the index ends on an epoch whose
    * centroids were re-trained over the FULL corpus (Lloyd initialized
    * from the nCells smallest ids — the init never depends on earlier
    * epochs), so the expected answer is: one sequential Lloyd over the
    * whole table, then the q57-style assignment/probe/re-rank loops in
    * plain Scala. Lloyd accumulates in DOUBLE and rounds to float only
    * at the division, exactly like `Similarity.kmeansDistributed` — the
    * ~1e-13 relative error of double-summing a few thousand floats is
    * far below float's ulp, so summation order cannot move the float
    * centroids. The geometry primitives (nearestCell/probeCells/cosine)
    * are shared, as in q57; everything the index adds — round slots,
    * epoch commits, posting survival — is independent and breaks this
    * compare if a vector is lost or duplicated anywhere in the
    * append/re-train chain.
    */
  private def q68Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val (nCells, iters, nProbe, k) = (16, 4, 4, 5)
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val dim = all.head._2.length
    var cs = all.take(nCells).map(_._2.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cs.length)(new Array[Double](dim))
      val counts = new Array[Long](cs.length)
      all.foreach { case (_, v) =>
        val c = Similarity.nearestCell(v, cs)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      cs = cs.indices.map { c =>
        if (counts(c) == 0) cs(c)
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    val centroids = cs
    val cellOf: Map[Long, Int] =
      all.map { case (id, v) => id -> Similarity.nearestCell(v, centroids) }.toMap
    val out = ivfProbeTopK(all, centroids, cellOf, nProbe, k)
    write(dumpRoot, "q68_ivf_index_topk",
          out.sortBy(r => (r.query_id, -r.sim, r.neighbor_id)).toSeq.toDF())
  }

  /** Expected multimodal metadata recomputed from [[MediaGen]]'s pure
    * parameter functions (dims/channels/frame counts) and the pixel
    * contract (frame hashes fold the pixel FUNCTION directly) — the
    * oracle never touches the encoder→parser path under test except for
    * the byte length, which depends on deflate/LZW output size.
    */
  private def q37q38Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect().sorted
    val q37 = ids.filter(_ % 3 != 0).map { id =>
      val seed = MediaGen.seedOfId(id)
      val (w, h) = MediaGen.imageDims(seed)
      val (ext, ch) = if (id % 3 == 1) ("png", if (id % 6 == 4) 4 else 3)
                      else ("jpg", 3)
      val nBytes = (if (id % 3 == 1) MediaGen.png(w, h, alpha = id % 6 == 4)
                    else MediaGen.jpeg(w, h)).length.toLong
      Multimodal.ImageMeta(s"https://media.test/m-$id.$ext", w, h, ch, nBytes)
    }.sortBy(_.media_ref)
    write(dumpRoot, "q37_image_meta", q37.toSeq.toDF())
    val q38 = ids.filter(_ % 3 == 0).flatMap { id =>
      val seed = MediaGen.seedOfId(id)
      val (w, h) = MediaGen.videoDims(seed)
      val n = MediaGen.frameCountOf(seed)
      (0 until n by 7).map { f =>
        val hash = MediaGen.pixelFold(
          (0 until w * h).iterator.map(i => MediaGen.pixel(seed, f, i)))
        Multimodal.FrameSample(s"https://media.test/m-$id.gif", f, hash)
      }
    }.sortBy(f => (f.media_ref, f.frame_idx))
    write(dumpRoot, "q38_frame_sample", q38.toSeq.toDF())

    // q71 frame profiles: ink + nearest-neighbor 8x8 resize hash, both
    // straight from the pure pixel function (the decoder never runs
    // here — a resize-mapping or LZW bug on either side breaks this)
    val (everyN, dw, dh) = (3, 8, 8)
    val q71 = ids.filter(_ % 3 == 0).flatMap { id =>
      val seed = MediaGen.seedOfId(id)
      val (w, h) = MediaGen.videoDims(seed)
      val n = MediaGen.frameCountOf(seed)
      (0 until n by everyN).map { f =>
        val ink =
          (0 until w * h).count(i => MediaGen.pixel(seed, f, i) != 0).toLong
        val rh = MediaGen.pixelFold(
          (0 until dh).iterator.flatMap(ty =>
            (0 until dw).iterator.map(tx =>
              MediaGen.pixel(seed, f, (ty * h / dh) * w + tx * w / dw))))
        Multimodal.FrameProfile(s"https://media.test/m-$id.gif", f, ink, rh)
      }
    }.sortBy(p => (p.media_ref, p.frame_idx))
    write(dumpRoot, "q71_frame_profile", q71.toSeq.toDF())
  }

  /** Independent plain-Scala xxHash64 (from the published xxHash spec)
    * — oracles Spark's `xxhash64` column function without touching
    * Catalyst. Used by the q60 UA-rotation dump.
    */
  private[graft] object XXH64 {
    private val P1 = 0x9e3779b185ebca87L
    private val P2 = 0xc2b2ae3d27d4eb4fL
    private val P3 = 0x165667b19e3779f9L
    private val P4 = 0x85ebca77c2b2ae63L
    private val P5 = 0x27d4eb2f165667c5L
    private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    private def le64(b: Array[Byte], i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
      v
    }
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def round(acc: Long, in: Long): Long = rotl(acc + in * P2, 31) * P1
    private def merge(acc: Long, v: Long): Long = (acc ^ round(0L, v)) * P1 + P4

    def hash(data: Array[Byte], seed: Long): Long = {
      val len = data.length
      var i = 0
      var h =
        if (len >= 32) {
          var v1 = seed + P1 + P2; var v2 = seed + P2
          var v3 = seed; var v4 = seed - P1
          while (i + 32 <= len) {
            v1 = round(v1, le64(data, i)); v2 = round(v2, le64(data, i + 8))
            v3 = round(v3, le64(data, i + 16)); v4 = round(v4, le64(data, i + 24))
            i += 32
          }
          var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
          acc = merge(acc, v1); acc = merge(acc, v2)
          acc = merge(acc, v3); merge(acc, v4)
        } else seed + P5
      h += len
      while (i + 8 <= len) {
        h ^= round(0L, le64(data, i)); h = rotl(h, 27) * P1 + P4; i += 8
      }
      if (i + 4 <= len) { h ^= le32(data, i) * P1; h = rotl(h, 23) * P2 + P3; i += 4 }
      while (i < len) { h ^= (data(i) & 0xffL) * P5; h = rotl(h, 11) * P1; i += 1 }
      h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^ (h >>> 32)
    }
  }

  final case class Q60Row(p_partkey: Long, url: String, ua: String)

  final case class Q73Row(doc_id: Long, lang: String, bucket: Long)
  final case class Q88Row(node: Long, rank: Long)

  /** q73 sampling oracle: an independent sequential recomputation of
    * the hash-predicate draw — same rate table as the query (duplicated
    * deliberately: the oracle must not import the operator under test),
    * bucket via the local XXH64 reimplementation over the same key
    * string, keep rule compared against floor(rate * 10^6).
    */
  private def q73Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val rates = Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.25)
    val defaultRate = 0.1
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().sortBy(_._1)
    val out = rows.flatMap { case (id, lang) =>
      val key = s"$lang:$id:mix-v1"
      val bucket = Math.floorMod(XXH64.hash(key.getBytes("UTF-8"), 42L), 1000000L)
      val thr = (rates.getOrElse(lang, defaultRate) * 1000000L).toLong
      if (bucket < thr) Some(Q73Row(id, lang, bucket)) else None
    }
    write(dumpRoot, "q73_stratified_sample", out.toSeq.toDF())
  }

  /** ST5 UA-rotation oracle: url built with plain string ops, hashed by
    * the independent [[XXH64]] (Spark's seed is 42), modded into the
    * same UA table the query uses.
    */
  private def q60Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val uas = graft.fetch.TransportConfig.defaultUserAgents
    val rows = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_name").as[(Long, String)].collect().sortBy(_._1)
    val out = rows.map { case (k, name) =>
      val url = "https://shop.test/item/" +
        name.toLowerCase.replace(' ', '-') + "-iid-" + k
      val h = XXH64.hash(url.getBytes("UTF-8"), 42L)
      val idx = (((h % uas.size) + uas.size) % uas.size).toInt
      Q60Row(k, url, uas(idx))
    }
    write(dumpRoot, "q60_ua_pick", out.toSeq.toDF())
  }

  /** Sequential replay of the facet-split fixpoint with q45's inputs. */
  private def q45Dump(spark: SparkSession, dumpRoot: String): Unit = {
    import spark.implicits._
    val api = FacetSplit.SyntheticFacetApi(seed = 55L)
    val thr = 1000L
    var frontier = Vector(Q45Row("root", 17099L, 0, settled = false),
                          Q45Row("alt", 420L, 0, settled = false))
    var leaves = Vector.empty[Q45Row]
    var iter = 0
    var hotLeft = true
    while (hotLeft && iter < 8) {
      leaves ++= frontier.filter(f => f.count < thr || f.settled)
      val hot = frontier.filter(f => f.count >= thr && !f.settled)
      if (hot.isEmpty) { frontier = Vector.empty; hotLeft = false }
      else {
        frontier = hot.flatMap { f =>
          val cs = api.childrenOf(f.id, f.count)
          if (cs.isEmpty) Vector(f.copy(settled = true))
          else cs.toVector.map { case (cid, cc) =>
            Q45Row(cid, cc, f.depth + 1, settled = false)
          }
        }
        iter += 1
      }
    }
    write(dumpRoot, "q45_facet_split", (leaves ++ frontier).sortBy(_.id).toDF())
  }

  /** q64 session-window oracle: sequential gap-merge sessionization of
    * the SAME derived fetch-event log the streaming query replays
    * (host = user bucket, status from event_type). The replay's flush
    * batches push the watermark past every real session's close point,
    * so the streamed output must equal ALL sessions — this dump is
    * schedule-free: a plain per-host fold over ts-sorted events,
    * merging while the gap is within `gapSec` (the same millisecond
    * arithmetic the operator contracts, full-precision timestamps kept
    * for the session bounds).
    */
  private def q64Dump(spark: SparkSession, dir: String,
                      dumpRoot: String): Unit = {
    import spark.implicits._
    val gapMs = 1800 * 1000L
    val evs = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "ts", "event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .map { case (u, ts, et) =>
        ("h" + (((u % 8) + 8) % 8), ts, if (et == "error") 503 else 200)
      }
    val out = evs.groupBy(_._1).toSeq.flatMap { case (host, es) =>
      val sorted = es.sortBy(e => (e._2.getTime, e._2.getNanos))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Q64Row]
      var cur: Q64Row = null
      sorted.foreach { case (_, ts, status) =>
        val ok = if (status == 200) 1L else 0L
        if (cur == null) cur = Q64Row(host, 1L, ok, ts, ts)
        else if (ts.getTime - cur.last_ts.getTime <= gapMs)
          cur = cur.copy(n_fetches = cur.n_fetches + 1, n_ok = cur.n_ok + ok,
                         last_ts = if (ts.after(cur.last_ts)) ts else cur.last_ts)
        else { sessions += cur; cur = Q64Row(host, 1L, ok, ts, ts) }
      }
      if (cur != null) sessions += cur
      sessions
    }.sortBy(r => (r.host, r.first_ts.getTime, r.first_ts.getNanos))
    write(dumpRoot, "q64_stream_sessions", out.toDF())
  }

  /** Write every expected table under `dumpRoot`. Individual failures
    * are isolated: the affected query's oracle read fails, the rest
    * stay green.
    */
  /** q88 oracle: the IDENTICAL fixed-point PageRank, sequentially —
    * integer arithmetic commutes exactly, so this must match the
    * distributed run bit-for-bit (that exactness is the operator's
    * contract, see [[graft.ops.PageRank]]).
    */
  private def q88Dump(spark: SparkSession, dir: String, dumpRoot: String): Unit = {
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("cast(l_partkey as long)", "cast(l_suppkey as long)")
      .as[(Long, Long)].collect()
    val edges: Set[(Long, Long)] = li.iterator.flatMap { case (p, s0) =>
      val sp = s0 + 10000000L
      Iterator((p, sp), (sp, p))
    }.toSet
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSeq.distinct.sorted
    val n = nodes.size.toLong
    val scale = graft.ops.PageRank.scale
    val outDeg: Map[Long, Long] =
      edges.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank: Map[Long, Long] = nodes.map(_ -> scale / n).toMap
    val base = (scale * 15L / 100L) / n
    (1 to 10).foreach { _ =>
      val sums = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, dst) => sums(dst) += rank(src) / outDeg(src) }
      rank = nodes.map(nd => nd -> (base + sums(nd) * 85L / 100L)).toMap
    }
    write(dumpRoot, "q88_pagerank", nodes.map(nd => Q88Row(nd, rank(nd))).toDF())
  }

  def writeAll(spark: SparkSession, dir: String,
               dumpRoot: String = root): Unit = {
    def guarded(name: String)(body: => Unit): Unit =
      try body
      catch { case e: Throwable =>
        // e.toString + stack, not getMessage: an NPE's message is null,
        // and the downstream symptom (a DuckDB read of the missing
        // parquet) points nowhere near the real cause
        System.err.println(s"[seq-oracle] $name failed: $e")
        e.printStackTrace()
      }
    guarded("crawl")(crawlDumps(spark, dumpRoot))
    guarded("q28")(q28Dump(spark, dir, dumpRoot))
    guarded("q32")(q32Dump(spark, dir, dumpRoot))
    guarded("q35")(q35Dump(spark, dir, dumpRoot))
    guarded("q57")(q57Dump(spark, dir, dumpRoot))
    guarded("q68")(q68Dump(spark, dir, dumpRoot))
    guarded("q37q38")(q37q38Dump(spark, dir, dumpRoot))
    guarded("q45")(q45Dump(spark, dumpRoot))
    guarded("q60")(q60Dump(spark, dir, dumpRoot))
    guarded("q73")(q73Dump(spark, dir, dumpRoot))
    guarded("q64")(q64Dump(spark, dir, dumpRoot))
    guarded("q88")(q88Dump(spark, dir, dumpRoot))
  }
}
