package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set (the GPT-3 / Pile
  * style 13-gram overlap check, parameterised on n).
  *
  * A training-data pipeline MUST run this before shipping a corpus —
  * eval items leaking into training data silently inflate benchmark
  * scores. The reference engine's scrapers feed exactly such corpora
  * (e.g. the listing/detail text fields of indeed/main.go:84 and the
  * trimmed description text of jobstreet/main.go:150), so
  * decontamination is first-class here alongside dedup.
  *
  * Scale shape (the part that matters at 100 TB): the benchmark side
  * is small by construction (eval suites are thousands of items, not
  * billions), so its distinct gram set is broadcast — the corpus side
  * is ONE codegen'd pass (shingling via [[HashOps.shingles_col]]) plus
  * a broadcast-hash semi join and a partial-aggregated count per doc.
  * The corpus never shuffles its text: the only exchange carries
  * (id, n_hit_grams) pairs for the final fill-zeros left join, keyed
  * on the doc id. No all-pairs step exists at any size.
  */
object Decontaminate {

  /** Per-document overlap counts against `benchmark`'s n-gram set.
    *
    * Returns (id, n_hit_grams, contaminated) for EVERY corpus row —
    * clean docs carry an explicit 0/false so the output is a total
    * audit table, not just the flagged subset. `n_hit_grams` counts
    * DISTINCT overlapping grams ([[Dedup.shingles]] emits a distinct
    * gram set per doc, and the benchmark side is made distinct here),
    * so the count is stable under repeated phrases on either side.
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame,
              idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val spark = corpus.sparkSession
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    // prefilter: a fused row-local kernel (HashOps.gramHit) hashes each
    // corpus gram incrementally over the lowercased bytes — no word
    // arrays, no gram strings — and checks it against the broadcast
    // sorted hash set of the benchmark grams. Gram equality implies
    // hash equality, so the prefilter has NO false negatives; a false
    // positive only admits an extra doc into the exact string-join
    // verification below, whose algebra is unchanged. The expensive
    // shingle-string materialization now runs over the maybe-hit sliver
    // instead of the whole corpus. The benchmark side is driver-scale
    // by the operator's contract (eval suites, not corpora), so the
    // collect here is bounded the same way the broadcast always was.
    val benchHashes: Array[Long] = benchGrams
      .collect()
      .map(r => HashOps.tokenHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
    java.util.Arrays.sort(benchHashes)
    val bc = spark.sparkContext.broadcast(benchHashes)
    val hits = corpus
      .select(col(idCol).as("id"), col(textCol).as("__dc_text"))
      .filter(HashOps.gram_hit_col(col("__dc_text"), n, bc))
      .select(col("id"),
              explode(Dedup.shingles(col("__dc_text"), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hit_grams"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
              coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"))
      .withColumn("contaminated", col("n_hit_grams") > 0)
  }
}
