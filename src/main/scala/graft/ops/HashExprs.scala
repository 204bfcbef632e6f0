package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprs
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.synthweb.SyntheticWeb.mix64

/** Single-pass sketch expressions.
  *
  * The composed-Catalyst formulations (64 `aggregate()` bit-votes for
  * SimHash, `numHashes` transform+aggregate passes for MinHash) re-scan
  * the token array once per output slot — O(slots × tokens) work per
  * row. These custom expressions compute the whole sketch in ONE pass
  * (O(tokens + slots)), stay inside whole-stage codegen via a static
  * call, and cut the dedup pipeline's signature stage by an order of
  * magnitude at corpus scale.
  */
object HashOps extends Serializable {

  /** FNV-1a over UTF-8 bytes, finished with splitmix64 — the shared
    * token hash for both sketches.
    */
  def tokenHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** One-pass 64-bit SimHash over a string array: each token's hash
    * votes +1/-1 per bit; sign forms the signature.
    */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = tokenHash(arr.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** One-pass MinHash signature: h_i(x) = mix64(tokenHash(x) ^ mix64(i)),
    * minimum per slot; empty arrays yield Long.MaxValue slots.
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n => Array.tabulate(n)(j => mix64(j.toLong)))

  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seeds = seedsFor(numHashes)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base = tokenHash(arr.getUTF8String(i))
      var k = 0
      while (k < numHashes) {
        val h = mix64(base ^ seeds(k))
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Fused words -> word-n-gram MinHash: the banding path only ever
    * HASHES the shingle strings, so this computes every gram's
    * [[tokenHash]] incrementally over the lowercased byte array (FNV-1a
    * is byte-sequential: hashing word-slice bytes with single space
    * bytes between them is exactly hashing the concatenated
    * `w1 w2 … wn` string) without materializing the word array or any
    * gram string. The first-occurrence dedup in [[shingles]] is skipped
    * outright — a per-slot MIN is idempotent under duplicates — so the
    * resulting signature is bit-identical to
    * `minhash(shingles(words(text), n), numHashes)`.
    *
    * Returns null when the text has fewer than n words — the exact
    * rows the composed form's `size(sh) > 0` filter drops.
    */
  def minhashText(s: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val len = bytes.length
    // word offsets over maximal [a-z0-9] byte runs (Words.split's scan)
    var nWords = 0
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val st = i
        i += 1
        while (i < len && {
                 val c = bytes(i)
                 (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
               }) i += 1
        if (nWords == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nWords) = st
        ends(nWords) = i
        nWords += 1
      } else i += 1
    }
    if (nWords < n) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seeds = seedsFor(numHashes)
    var w = 0
    while (w <= nWords - n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= 0x20L; h *= 0x100000001b3L } // the joining space
        var p = starts(w + j)
        val e = ends(w + j)
        while (p < e) { h ^= (bytes(p) & 0xffL); h *= 0x100000001b3L; p += 1 }
        j += 1
      }
      val base = mix64(h)
      var k = 0
      while (k < numHashes) {
        val hh = mix64(base ^ seeds(k))
        if (hh < mins(k)) mins(k) = hh
        k += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  def minhash_text_col(text: Column, n: Int, numHashes: Int): Column =
    GraftExprs.toColumn(
      MinHashTextExpression(GraftExprs.toExpr(text), n, numHashes))

  /** Word (start, end) byte offsets over the lowercased byte array —
    * the shared tokenizer scan of [[Words.split]] / [[minhashText]],
    * packed as [s0, e0, s1, e1, …]; returns (packed, nWords).
    */
  private def wordOffsets(bytes: Array[Byte]): (Array[Int], Int) = {
    val len = bytes.length
    var n = 0
    var cap = 32
    var off = new Array[Int](cap)
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val st = i
        i += 1
        while (i < len && {
                 val c = bytes(i)
                 (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
               }) i += 1
        if (2 * n == cap) { cap *= 2; off = java.util.Arrays.copyOf(off, cap) }
        off(2 * n) = st
        off(2 * n + 1) = i
        n += 1
      } else i += 1
    }
    (off, n)
  }

  /** Fused sliding-window chunker: one pass from text to
    * array<struct<chunk_idx, n_tokens, chunk_text>> — exactly the rows
    * the composed words/explode/slice/array_join chain produced, but
    * without materializing the word array once per CHUNK row (the
    * generator copied the full `ws` array into every emitted row, so a
    * 100-word doc moved ~100 x nChunks word copies through the
    * pipeline where the chunks themselves hold ~chunkSize x nChunks).
    * chunk_text bytes are copied straight from the lowercased byte
    * array with single joining spaces — byte-identical to
    * `array_join(slice(words, idx*stride+1, chunkSize), " ")`.
    */
  def chunks(s: UTF8String, chunkSize: Int, stride: Int): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val (off, nWords) = wordOffsets(bytes)
    if (nWords == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks =
      if (nWords <= chunkSize) 1
      else 1 + math.ceil((nWords - chunkSize).toDouble / stride).toInt
    val out = new Array[Any](nChunks)
    var c = 0
    while (c < nChunks) {
      val start = c * stride
      val end = math.min(start + chunkSize, nWords)
      val nTok = end - start
      var blen = nTok - 1
      var w = start
      while (w < end) { blen += off(2 * w + 1) - off(2 * w); w += 1 }
      val buf = new Array[Byte](blen)
      var o = 0
      w = start
      while (w < end) {
        if (w > start) { buf(o) = ' '; o += 1 }
        val l = off(2 * w + 1) - off(2 * w)
        System.arraycopy(bytes, off(2 * w), buf, o, l)
        o += l
        w += 1
      }
      out(c) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](c.toLong, nTok.toLong, UTF8String.fromBytes(buf)))
      c += 1
    }
    new GenericArrayData(out)
  }

  def chunks_col(text: Column, chunkSize: Int, stride: Int): Column =
    GraftExprs.toColumn(
      ChunksExpression(GraftExprs.toExpr(text), chunkSize, stride))

  /** True iff any word n-gram of `s` hashes ([[tokenHash]] semantics,
    * computed incrementally like [[minhashText]]) into the SORTED
    * `hashes` array — the decontamination prefilter. Gram equality
    * implies hash equality, so this has NO false negatives; false
    * positives only admit extra rows into the exact string-join
    * verification downstream.
    */
  def gramHit(s: UTF8String, n: Int, hashes: Array[Long]): Boolean = {
    if (hashes.isEmpty) return false
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val (off, nWords) = wordOffsets(bytes)
    if (nWords < n) return false
    var w = 0
    while (w <= nWords - n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        if (j > 0) { h ^= 0x20L; h *= 0x100000001b3L }
        var p = off(2 * (w + j))
        val e = off(2 * (w + j) + 1)
        while (p < e) { h ^= (bytes(p) & 0xffL); h *= 0x100000001b3L; p += 1 }
        j += 1
      }
      if (java.util.Arrays.binarySearch(hashes, mix64(h)) >= 0) return true
      w += 1
    }
    false
  }

  def gram_hit_col(text: Column, n: Int,
                   hashes: org.apache.spark.broadcast.Broadcast[Array[Long]])
      : Column =
    GraftExprs.toColumn(GramHitExpression(GraftExprs.toExpr(text), n, hashes))

  def simhash_col(tokens: Column): Column =
    GraftExprs.toColumn(SimHash64Expression(GraftExprs.toExpr(tokens)))

  def minhash_col(tokens: Column, numHashes: Int): Column =
    GraftExprs.toColumn(MinHashExpression(GraftExprs.toExpr(tokens), numHashes))

  private val Space = UTF8String.fromString(" ")

  /** One-pass distinct word-n-gram shingling (first-occurrence order —
    * same output as the array_distinct/transform/slice/array_join
    * Catalyst chain it replaces, which evaluated as INTERPRETED
    * higher-order functions and dominated the dedup pipeline's CPU at
    * corpus scale: ~6 ms/doc interpreted vs ~40 µs here).
    */
  def shingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size))
      .asInstanceOf[Array[Any]])
  }

  def shingles_col(words: Column, n: Int): Column =
    GraftExprs.toColumn(ShinglesExpression(GraftExprs.toExpr(words), n))

  /** One-pass LSH band buckets over a MinHash signature — bucket b is
    * BIT-IDENTICAL to Catalyst's
    * `xxhash64(slice(sig, b*rowsPerBand + 1, rowsPerBand), b)`:
    * XxHash64 folds its children left-to-right from seed 42, hashing
    * each array element with `XXH64.hashLong` and the band index (an
    * int, from `sequence(0, bands-1)`) with `XXH64.hashInt`. The
    * composed transform/slice/xxhash64 chain evaluated as interpreted
    * higher-order functions and allocated a sub-array per band per row
    * (measured ~2.2 s of the 125k-doc banding pass); this computes all
    * bands in one codegen'd pass with zero allocation beyond the output.
    */
  def bandBuckets(sig: ArrayData, rowsPerBand: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = sig.numElements()
    val bands = n / rowsPerBand
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) { acc = XXH64.hashLong(sig.getLong(i), acc); i += 1 }
      out(b) = XXH64.hashInt(b, acc)
      b += 1
    }
    new GenericArrayData(out)
  }

  def band_buckets_col(sig: Column, rowsPerBand: Int): Column =
    GraftExprs.toColumn(BandBucketsExpression(GraftExprs.toExpr(sig), rowsPerBand))

  /** All `tables` random-hyperplane signatures of a float vector in one
    * codegen'd pass — bit-identical to calling
    * [[Similarity.signatureAt]] per table (same memoized plane
    * components via [[Similarity.planesFor]], same double accumulation
    * order), but evaluated directly over the columnar `ArrayData`
    * instead of a Dataset `mapPartitions` that decoded every vector
    * into an external `Array[Float]` first. The decode dominated the
    * signature pass once the plane cache landed (the arithmetic is
    * ~tables x bits x dim flops; the decode was an allocation + copy
    * per row).
    */
  def hyperplaneSigs(vec: ArrayData, tables: Int, bits: Int,
                     seed: Long): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val planes = Similarity.planesFor(seed, t, bits, dim)
      var sig = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        val off = b * dim
        while (d < dim) {
          dot += vec.getFloat(d).toDouble * planes(off + d)
          d += 1
        }
        if (dot >= 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig.toLong
      t += 1
    }
    new GenericArrayData(out)
  }

  def hyperplane_sigs_col(vec: Column, tables: Int, bits: Int,
                          seed: Long): Column =
    GraftExprs.toColumn(
      HyperplaneSigsExpression(GraftExprs.toExpr(vec), tables, bits, seed))

  /** One-pass cosine similarity over two float arrays, associated
    * EXACTLY like the declarative q33 formulation it replaces —
    * dot / (sqrt(sum a²) * sqrt(sum b²)), every accumulation a
    * left-to-right double fold in array-index order, each element cast
    * to double before multiplying — so results are bit-identical to the
    * interpreted aggregate/zip_with/transform chain (which evaluated as
    * CodegenFallback higher-order functions, the dominant cost of the
    * brute-force scoring pass). Note the two-sqrt association differs
    * from [[Similarity.cosine]]'s sqrt(na*nb); both exist deliberately.
    */
  def cosineSim(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    // null-semantics parity with the chain: unequal lengths make
    // zip_with pad with nulls and any null element nulls the fold — in
    // both cases the declarative sim is NULL, so this one is too
    if (la != lb) return null
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < la) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    // separate index-order folds (not fused) to mirror the three
    // independent aggregate() folds of the declarative form exactly
    i = 0
    while (i < la) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    i = 0
    while (i < lb) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def cosine_sim_col(a: Column, b: Column): Column =
    GraftExprs.toColumn(CosineSimExpression(GraftExprs.toExpr(a), GraftExprs.toExpr(b)))

  /** The near-dup verify kernel: [[Similarity.cosine]]'s exact fold
    * (ONE fused dot/na/nb loop over min length, 0.0 on zero norms —
    * note this association differs from [[cosineSim]]'s three separate
    * folds; both exist deliberately) followed by the verify paths'
    * `math.rint(c * 10000) / 10000` rounding, computed inside codegen.
    * Replaces a Dataset `.map` that decoded BOTH float arrays of every
    * candidate pair into external objects — at ~1.5M random-collision
    * candidates per at-scale pass, the decode dominated verification.
    * Bit-identical: same primitive ops in the same order.
    */
  def cosineRint4(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val x = a.getFloat(i)
      val y = b.getFloat(i)
      dot += x.toDouble * y
      na += x.toDouble * x
      nb += y.toDouble * y
      i += 1
    }
    val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    math.rint(c * 10000) / 10000
  }

  def cosine_rint4_col(a: Column, b: Column): Column =
    GraftExprs.toColumn(
      CosineRint4Expression(GraftExprs.toExpr(a), GraftExprs.toExpr(b)))
}

case class SimHash64Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.simhash64(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.HashOps.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashExpression(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    HashOps.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.HashOps.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild, numHashes = numHashes)
}

case class MinHashTextExpression(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for texts with < n words
  override protected def nullSafeEval(input: Any): Any =
    HashOps.minhashText(input.asInstanceOf[UTF8String], n, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("graftMhT")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.ops.HashOps.minhashText($c, $n, $numHashes);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ChunksExpression(child: Expression, chunkSize: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_idx", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk_text",
        org.apache.spark.sql.types.StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    HashOps.chunks(input.asInstanceOf[UTF8String], chunkSize, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.HashOps.chunks($c, $chunkSize, $stride)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class GramHitExpression(child: Expression, n: Int,
                             hashes: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      HashOps.gramHit(input.asInstanceOf[UTF8String], n, hashes.value))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftGramHashes", hashes,
      classOf[org.apache.spark.broadcast.Broadcast[Array[Long]]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.ops.HashOps.gramHit($c, $n, (long[]) $bcRef.value())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BandBucketsExpression(child: Expression, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    HashOps.bandBuckets(input.asInstanceOf[ArrayData], rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.HashOps.bandBuckets($c, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild, rowsPerBand = rowsPerBand)
}

case class CosineSimExpression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true // null on length/element mismatch
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashOps.cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("graftCos")
      s"""
         |java.lang.Double $tmp = graft.ops.HashOps.cosineSim($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosineRint4Expression(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      HashOps.cosineRint4(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.HashOps.cosineRint4($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class HyperplaneSigsExpression(child: Expression, tables: Int,
                                    bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    HashOps.hyperplaneSigs(input.asInstanceOf[ArrayData], tables, bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.HashOps.hyperplaneSigs($c, $tables, $bits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.HashOps.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild, n = n)
}
