package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.GraftExprs

import graft.seen.BloomFilter

/** Bloom-prefiltered join: drop big-side rows whose key *definitely*
  * has no match BEFORE they reach the join's shuffle exchange.
  *
  * Spark's own runtime bloom filter (`spark.sql.optimizer.runtime.
  * bloomFilter.*`) covers the single-query case where one join side
  * carries a selective predicate; this operator covers what that
  * can't: the filter here is an explicit, *persistable, mergeable*
  * artifact ([[graft.seen.BloomFilter]] — the same tier the crawl's
  * seen-set broadcasts and checkpoints with each round's manifest),
  * so a 100 TB pipeline builds it ONCE over the small side (an eval
  * set, a blocklist, this round's frontier) and reuses it across many
  * queries and rounds without re-scanning, merging shard-local blooms
  * associatively. Correctness does not depend on the filter at all —
  * a bloom has no false negatives, so
  * `bloomPrefilteredJoin(big, small, key) == big.join(small, key)`
  * EXACTLY; false positives only cost a shuffled row that the exact
  * join then drops (q99's oracle is the plain SQL join for this
  * reason).
  *
  * Scale shape: one pass over the small side builds the bloom with
  * map-side partial aggregation (no raw keys to the driver — only the
  * O(bits) filter), the filter ships to executors once as a broadcast,
  * and the membership probe is a codegen'd unary expression fused into
  * the big side's scan stage — under, not above, the exchange
  * (BloomPruneSpec pins that plan shape). At a key cardinality where
  * one bloom exceeds broadcast budget, shard by key-hash bucket
  * exactly as the seen tier does (`Snapshots.bloomShardPathAt`) and
  * prefilter each co-partitioned bucket with its own shard.
  *
  * Reference behavior this scales: the implicit URL-revisit dedup the
  * reference's collector relies on (colly tracks visited URLs
  * internally; the scrapers carry no explicit seen-set code),
  * generalized to arbitrary join keys.
  */
object BloomPrune {

  /** Canonical key encoding shared by build and probe: sha-256 hex of
    * the key's string form — the (already uniform) double-hash input
    * [[BloomFilter.put]] expects. Null keys stay null and are dropped
    * by the probe, matching inner-join semantics. Both sides must
    * carry the SAME key type ([[bloomPrefilteredJoin]] enforces it);
    * avoid floating-point keys — join equality normalizes -0.0 == 0.0
    * but their string forms (and so hashes) differ.
    */
  def keyHex(c: Column): Column = sha2(c.cast("string"), 256)

  /** One aggregation pass over `small`'s keys → the bloom, sized for
    * `expected` items. The default (`expected = -1`) first COUNTS the
    * small side — a second, cheap scan (row-count only, no hashing)
    * whose result is an upper bound on distinct keys and only
    * oversizes. When the "small" side is itself large (a frontier or
    * blocklist at scale), pass `expected` explicitly to make the
    * build a genuine single pass; sizing cannot follow the
    * aggregation, because the filter's bit width must be fixed before
    * the first `put`.
    */
  def buildKeyBloom(small: DataFrame, key: String, fpp: Double = 0.01,
                    expected: Long = -1L): BloomFilter = {
    val spark = small.sparkSession
    import spark.implicits._
    val keys = small.select(keyHex(col(key)).as("__h")).na.drop()
    val n = if (expected > 0) expected else keys.count()
    val proto = BloomFilter.sized(math.max(n, 1L), fpp)
    val bytes = keys.as[String]
      .select(BloomFilter.agg(proto.numBits, proto.numHashes).toColumn)
      .head()
    BloomFilter.deserialize(bytes)
  }

  /** Membership probe as a Column: true iff `c`'s key MIGHT be in the
    * broadcast filter (never false for a present key).
    */
  def mightContainCol(c: Column, bc: Broadcast[BloomFilter]): Column =
    GraftExprs.toColumn(
      BloomMightContainExpr(GraftExprs.toExpr(keyHex(c)), bc))

  /** `big ⋈ small` on `key` (inner), with the big side bloom-pruned
    * before its shuffle. Result equals `big.join(small, Seq(key))`
    * exactly.
    */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame, key: String,
                           fpp: Double = 0.01,
                           expected: Long = -1L): DataFrame = {
    // keyHex encodes the key's STRING form, while a mixed-type join
    // would compare under Catalyst's numeric coercion — e.g. double
    // 1.0 ("1.0") joins long 1 ("1") but their hashes differ, a bloom
    // FALSE NEGATIVE that silently drops matching rows. Refuse the
    // mismatch up front; the caller casts one side explicitly.
    val bt = big.schema(key).dataType
    val st = small.schema(key).dataType
    require(bt == st,
            s"bloomPrefilteredJoin key '$key' types differ: big=$bt " +
              s"small=$st — cast one side so string-form hashing agrees " +
              "with join equality")
    val filter = buildKeyBloom(small, key, fpp, expected)
    val bc = big.sparkSession.sparkContext.broadcast(filter)
    big.filter(mightContainCol(col(key), bc)).join(small, Seq(key))
  }
}

/** Codegen'd bloom membership over a sha-256-hex key column. The
  * filter rides an explicit Broadcast (fetched once per executor, not
  * re-shipped with every stage's task binary); codegen references the
  * broadcast handle and probes the deserialized words in place.
  */
case class BloomMightContainExpr(child: Expression,
                                 bc: Broadcast[BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      bc.value.mightContain(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((graft.seen.BloomFilter)$bcRef.value()).mightContain($c.toString())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
