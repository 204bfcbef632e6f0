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
