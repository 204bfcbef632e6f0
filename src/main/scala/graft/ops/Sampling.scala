package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture / stratified sampling for training-data
  * composition: per-stratum keep rates (e.g. per language, per source
  * domain) applied as a pure hash predicate — no RNG state, no
  * `sample()` nondeterminism, no shuffle.
  *
  * Keep rule: `floorMod(xxhash64(stratum ':' id ':' seed), 10^6) <
  * rate(stratum) * 10^6`. The decision for a given (row, seed) is a
  * pure function of the row, so it is identical across runs, executor
  * counts, retries and speculative tasks — the property that matters
  * when a 100 TB corpus is re-materialized and the sampled subset must
  * not drift. Changing `seed` draws an independent sample.
  *
  * Scale shape: the rate table is a handful of rows joined with an
  * explicit `broadcast()`; the predicate is codegen'd row-local work
  * that survives whole-stage codegen and pushes the sampled scan's
  * column pruning through untouched. Nothing shuffles.
  */
object Sampling {

  /** The sampling bucket in [0, 10^6): deterministic per (stratum, id,
    * seed). Exposed so callers can audit the draw.
    */
  def sampleBucket(stratum: Column, id: Column, seed: String): Column =
    pmod(xxhash64(concat(stratum, lit(":"), id.cast("string"),
                         lit(":"), lit(seed))),
         lit(1000000L))

  /** Rows of `df` kept by per-stratum rates (strata missing from
    * `rates` use `defaultRate`). Preserves the input schema and adds a
    * `bucket` audit column. Internal join/rate columns carry a
    * `__graft_` prefix so an input that already has a `rate` or
    * `stratum_key` column joins cleanly (a caller-side `bucket` column
    * is still replaced — that name is the documented output).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       seed: String): DataFrame = {
    val s = df.sparkSession
    val rateRows = rates.toSeq.map { case (k, v) => (k, v) }
    val rdf = s.createDataFrame(rateRows).toDF("__graft_stratum", "__graft_rate")
    df.join(broadcast(rdf), df(stratumCol) === rdf("__graft_stratum"), "left")
      .withColumn("__graft_rate_eff",
                  coalesce(col("__graft_rate"), lit(defaultRate)))
      .withColumn("bucket", sampleBucket(col(stratumCol), col(idCol), seed))
      .filter(col("bucket") < (col("__graft_rate_eff") * 1000000L).cast("long"))
      .select(df.columns.map(col) :+ col("bucket"): _*)
  }
}
