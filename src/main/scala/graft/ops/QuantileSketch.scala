package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch over positive integers —
  * the 100 TB companion to the exact distributed quantiles of q81
  * (whose declared cost is O(distinct values) per group): a
  * log-bucketed histogram in the DDSketch family, with ~2^-subBits
  * relative error, O(64 · 2^subBits) buckets per group regardless of
  * data size, and counts that merge by addition (shard-local sketches
  * combine associatively — the map-side-combine shape).
  *
  * Unlike `approx_percentile` (whose result depends on merge order),
  * every step here is INTEGER arithmetic on a bucket id derived from
  * the value's binary-string length — deterministic at any
  * parallelism, and exactly re-derivable by an independent engine
  * (q102's DuckDB oracle rebuilds bucket ids via `to_base(x, 2)` the
  * way this operator uses `conv(x, 10, 2)`; both are exact string
  * ops, unlike floor(log2(x)) whose libm rounding differs across
  * engines: Math.log(8)/Math.log(2) = 2.9999999999999996 in the JVM).
  *
  * Bucketing (subBits = s): values below 2^s are their own exact
  * bucket (id = v); larger values map to id = msb·2^s + (v >> (msb-s))
  * - 2^s where msb = len(binary(v)) - 1 — each octave splits into 2^s
  * sub-buckets keyed by the top s+1 bits. The id is monotone in v, so
  * a cumulative count walk yields quantiles; the estimate is the
  * bucket's LOWER bound, hence est <= true < est·(1 + 2^-s) (exact
  * below 2^s). The quantile rank is ceil(p·N/100) in integer `div`
  * arithmetic — no IEEE division anywhere.
  *
  * Plan shape: one map-side bucket projection (codegen'd string/shift
  * chain), one partial-agg groupBy on (group, bucket) — the ONLY
  * data-scale exchange, emitting at most groups × buckets rows — then
  * sketch-scale windowing over the bucket table. Raw values never
  * shuffle.
  */
object QuantileSketch {

  private def checkSubBits(s: Int): Unit =
    require(s >= 1 && s <= 8, s"subBits must be in [1, 8]: $s")

  /** Monotone log-bucket id of the positive long column `vName`.
    * SQL-expression form: shiftright's count argument is a column
    * (the Scala `functions.shiftright` only takes literals), and all
    * division is integer `div`.
    */
  def bucketId(vName: String, subBits: Int): Column = {
    val base = 1L << subBits
    expr(
      s"""CASE WHEN $vName < ${base}L THEN $vName
         |ELSE cast(length(conv($vName, 10, 2)) - 1 AS BIGINT) * ${base}L
         |     + shiftright($vName,
         |                  length(conv($vName, 10, 2)) - 1 - $subBits)
         |     - ${base}L END""".stripMargin)
  }

  /** Lower bound of a bucket id — the quantile estimate. */
  def bucketLower(idName: String, subBits: Int): Column = {
    val base = 1L << subBits
    expr(
      s"""CASE WHEN $idName < ${base}L THEN $idName
         |ELSE shiftleft(pmod($idName, ${base}L) + ${base}L,
         |               cast(shiftright($idName, $subBits) AS INT)
         |               - $subBits) END""".stripMargin)
  }

  /** Build the sketch: (group, bucket, cnt) rows. Null and
    * non-positive values are dropped (positive-domain sketch — shift
    * the domain or count zeros separately if they matter).
    */
  def histSketch(df: DataFrame, groupCol: String, valueCol: String,
                 subBits: Int = 4): DataFrame = {
    checkSubBits(subBits)
    // a group column named like the scratch/output columns would make
    // the internal references ambiguous (duplicate names after the
    // select) — fail with the reason instead of an analysis error
    require(!Set("__v", "bucket", "cnt").contains(groupCol),
            s"histSketch: groupCol '$groupCol' collides with the " +
              "reserved __v/bucket/cnt column names — rename it first")
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__v") > 0)
      .select(col(groupCol), bucketId("__v", subBits).as("bucket"))
      .groupBy(groupCol, "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches over the same group/subBits: counts add —
    * associative and commutative, the shard-combine path.
    */
  def histMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(groupCol, "bucket")
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a sketch: one row per (group, pct) with
    * the integer-rank lower-bound estimate. `pcts` are integer
    * percents (e.g. Seq(50, 90, 99)); rank = ceil(pct·N/100).
    */
  def histQuantiles(sketch: DataFrame, groupCol: String,
                    pcts: Seq[Int], subBits: Int = 4): DataFrame = {
    checkSubBits(subBits)
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
            s"percents must be in [1, 100]: $pcts")
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(groupCol).orderBy("bucket")
    // group totals as a second window over the SAME partitioning — not
    // a separate aggregate of `sketch`, which would re-execute the
    // whole data-scale scan+bucket subtree a second time (Spark does
    // not reuse the exchange across differently-shaped aggregates)
    val wAll = Window.partitionBy(groupCol)
    val cum = sketch
      .withColumn("cc", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(wAll))
    cum
      .crossJoin(broadcast(pcts.toDF("pct")))
      .filter(col("cc") >= expr("(cast(pct AS BIGINT) * n + 99L) div 100L"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min("bucket").as("qb"))
      .withColumn("est", bucketLower("qb", subBits))
      .drop("qb")
  }
}
