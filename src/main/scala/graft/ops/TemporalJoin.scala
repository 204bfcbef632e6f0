package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a training-data pipeline needs that Spark
  * has no built-in for: the backward as-of join (most recent right row
  * at-or-before each left row, per key) and the pure interval range
  * join (probe timestamp inside [start, end), NO equi key). Both are
  * composed from shuffle-planned primitives — one exchange per input,
  * no cartesian product, no driver-side loop — so they hold at 100 TB:
  *
  *   - [[asofBackward]] is the union-and-carry-forward formulation:
  *     tag both sides, union, and run ONE running-frame window
  *     (UNBOUNDED PRECEDING .. CURRENT ROW) per key. The frame is
  *     incremental in Spark's WindowExec (no whole-group
  *     re-evaluation), the only exchange is the hash partition on the
  *     key, and per-key memory is the group's rows (events per user —
  *     naturally bounded; a pathological key would salt the same way
  *     [[Skew.topKByGroup]] does).
  *   - [[intervalJoin]] is the bucketed formulation of the
  *     inequality join: intervals explode across the fixed-width time
  *     buckets they cover (replication = len/width + 1, caller picks
  *     the width to match interval length), probes land in exactly
  *     one bucket, and the engine plans a plain shuffled equi-join on
  *     the bucket with the exact range predicate evaluated inside —
  *     never a BroadcastNestedLoopJoin over the corpus. At 100 TB the
  *     bucket column is also the natural partition-pruning key when
  *     the interval table is written out partitioned by it.
  */
object TemporalJoin {

  /** Backward as-of join: for every left row, attach the payload of
    * the most recent right row with the same `key` whose `rightTs`
    * is <= the left row's `leftTs` (inclusive). Left rows with no
    * prior right row keep null payloads (left-outer semantics).
    *
    * The right side must be unique per (key, rightTs) — ties inside
    * one timestamp have no "most recent" — so callers pre-aggregate
    * (q96 dedupes with max(event_id)); enforced lazily by the fact
    * that which duplicate wins would be nondeterministic only if the
    * caller skipped that step.
    *
    * Plan shape: one union, one hash exchange on `key`, one sort, one
    * running-frame window. Nothing re-shuffles the left table twice
    * and no row of the right table is replicated.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   payloadCols: Seq[String]): DataFrame =
    asofDirectional(left, right, key, leftTs, rightTs, payloadCols,
                    forward = false)

  /** Forward as-of join: for every left row, attach the payload of the
    * EARLIEST right row with the same `key` whose `rightTs` is >= the
    * left row's `leftTs` (inclusive) — "what happened next". Same
    * contracts and plan shape as [[asofBackward]]; implemented as the
    * time-reversed carry (descending sort, identical running frame).
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  payloadCols: Seq[String]): DataFrame =
    asofDirectional(left, right, key, leftTs, rightTs, payloadCols,
                    forward = true)

  private def asofDirectional(left: DataFrame, right: DataFrame,
                              key: String, leftTs: String, rightTs: String,
                              payloadCols: Seq[String],
                              forward: Boolean): DataFrame = {
    // scratch-column guard (mirrors BloomPrune's type-mismatch guard
    // style): withColumn would silently OVERWRITE a left column named
    // like a reserved scratch column and re-select it corrupted, and a
    // payload column shadowing a left column would duplicate output
    // columns — fail loud instead
    val reserved = Set("__t", "__side", "__payload", "__carry")
    val clash = left.columns.filter(reserved.contains)
    require(clash.isEmpty,
            s"as-of join: left columns ${clash.mkString(", ")} collide " +
              "with reserved scratch names __t/__side/__payload/__carry — " +
              "rename them before joining")
    val payloadClash = payloadCols.filter(left.columns.contains)
    require(payloadClash.isEmpty,
            s"as-of join: payload columns ${payloadClash.mkString(", ")} " +
              "already exist on the left side — rename one side")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
                  lit(null).cast(org.apache.spark.sql.types.StructType(
                    right.select(payloadCols.map(col): _*).schema.fields)))
    val r = right
      // SQL equality semantics: a null key matches nothing, but
      // Window.partitionBy groups nulls together — so null-key right
      // rows must not enter the carry (left null-key rows then form a
      // right-free partition and keep null payloads, as a join would).
      // A null RIGHT timestamp satisfies no inequality either: without
      // the filter it would sort to the nulls-first end and masquerade
      // as the carry for every left row before the first real match.
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select((col(key) +: payloadCols.map(col)) :+
                col(rightTs).as("__t"): _*)
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(payloadCols.map(col): _*))
      .drop(payloadCols: _*)
    val unioned = l.select(
      (Seq(col(key), col("__t"), col("__side"), col("__payload")) ++
        leftCols.filterNot(_ == key).map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort BEFORE left rows at an equal timestamp,
    // so the match is INCLUSIVE in both directions. nulls_first pins
    // null LEFT timestamps to the start of the partition, ahead of any
    // right row — they keep null payloads instead of borrowing the
    // extreme carry.
    val ord =
      if (forward) Seq(col("__t").desc_nulls_first, col("__side"))
      else Seq(col("__t").asc_nulls_first, col("__side"))
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(
      "__carry", last(col("__payload"), ignoreNulls = true).over(w))
    filled
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
                payloadCols.map(p => col(s"__carry.$p").as(p))): _*)
  }

  /** Pure interval range join (no equi key): every (probe, interval)
    * pair with `probeTs` in [start, end). Returns probe columns plus
    * the interval's columns; callers aggregate (q97 counts windows
    * per probe).
    *
    * `bucketSec` is the bin width: intervals replicate over the
    * buckets they span (len/width + 1 copies), probes hash to exactly
    * one bucket, and each qualifying pair meets in exactly one bucket
    * — no post-join dedup. Pick the width near the typical interval
    * length; empty/negative intervals contribute nothing.
    */
  def intervalJoin(probe: DataFrame, probeTs: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   bucketSec: Long, maxSpanBuckets: Long = 10000L): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive: $bucketSec")
    // scratch-column guard (same class as the as-of join's): withColumn
    // would silently overwrite like-named input columns and the final
    // drop would remove the corrupted originals
    val ivReserved = Set("__bucket", "__b0", "__b1", "__b1g")
    val ivClash = (probe.columns.filter(_ == "__bucket") ++
      intervals.columns.filter(ivReserved.contains)).distinct
    require(ivClash.isEmpty,
            s"intervalJoin: input columns ${ivClash.mkString(", ")} collide " +
              "with reserved scratch names __bucket/__b0/__b1/__b1g — " +
              "rename them before joining")
    // Non-instant inputs (TIMESTAMP_NTZ / date / string) reach micros
    // through a session-zone cast. In a DST-observing zone that cast is
    // not monotone across the spring-forward gap, so a probe inside a
    // valid interval could bucket outside the interval's exploded range
    // and silently vanish — refuse those zones up front.
    import org.apache.spark.sql.types.TimestampType
    val allInstants =
      Seq(probe.schema(probeTs), intervals.schema(startCol),
          intervals.schema(endCol)).forall(_.dataType == TimestampType)
    if (!allInstants) {
      val zone = java.time.ZoneId.of(
        probe.sparkSession.sessionState.conf.sessionLocalTimeZone)
      require(
        zone.getRules.isFixedOffset,
        s"intervalJoin over non-instant timestamp columns needs a fixed-" +
          s"offset session zone (got $zone): the $zone cast is not " +
          "monotone across DST gaps. Set spark.sql.session.timeZone=UTC " +
          "or pass TIMESTAMP (instant) columns.")
    }
    val w = bucketSec * 1000000L // micros
    // exact floor division on longs, end to end: subtracting the pmod
    // gives floor (not truncate-toward-zero) for pre-1970 instants, and
    // the integer `div` keeps the quotient exact over the FULL long
    // range — the former `/` was IEEE double division, exact only while
    // |c - pmod| < 2^53 µs (roughly years 1685–2255), beyond which the
    // quotient could round below the integer and bucket a matching
    // probe/interval pair apart
    def bucketOf(c: org.apache.spark.sql.Column) = {
      import org.apache.spark.sql.GraftExprs
      GraftExprs.toColumn(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          GraftExprs.toExpr(c - pmod(c, lit(w))),
          GraftExprs.toExpr(lit(w)))).cast("long")
    }
    // TIMESTAMP_NTZ columns (parquet default) cast through the session
    // zone; under the fixed-offset zones the guard above admits, the
    // cast is strictly monotone, and bucketing only needs
    // probe/interval AGREEMENT — the exact range predicate below
    // compares the original untouched columns
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val p = probe.withColumn("__bucket", bucketOf(micros(probeTs)))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b0", bucketOf(micros(startCol)))
      // end-exclusive: the last covered instant is end - 1 microsecond
      .withColumn("__b1", bucketOf(micros(endCol) - 1))
      // loud row-local guard: an interval spanning > maxSpanBuckets
      // means the caller picked a width orders of magnitude off the
      // interval length — fail with the numbers instead of silently
      // replicating that row millions of times (Spark's own sequence
      // cap is ~2^31, far too late to help). The guard is fused INTO
      // the sequence bound so column pruning cannot optimize it away.
      .withColumn(
        "__b1g",
        when(col("__b1") - col("__b0") < lit(maxSpanBuckets), col("__b1"))
          .otherwise(raise_error(concat(
            lit(s"intervalJoin: interval spans more than $maxSpanBuckets " +
              s"buckets of ${bucketSec}s (start="),
            col(startCol).cast("string"), lit(", end="),
            col(endCol).cast("string"),
            lit(") — pick a bucketSec near the interval length")))
            .cast("long")))
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b1g"))))
      .drop("__b0", "__b1", "__b1g")
    p.join(iv, Seq("__bucket"))
      .filter(col(probeTs) >= col(startCol) && col(probeTs) < col(endCol))
      .drop("__bucket")
  }
}
