package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document's word
  * sequence into fixed-size chunks with a stride (overlap = chunkSize
  * - stride), the preprocessing step that turns variable-length crawl
  * documents into training-window-sized sequences.
  *
  * Scale shape: entirely row-local — words, chunk count, and the
  * per-chunk slices are all codegen'd column expressions over one
  * projection + one generator (`posexplode` of a small index range);
  * zero shuffles, zero state, linear in corpus bytes. A 100 TB corpus
  * chunks at scan speed with full partition parallelism.
  */
object Chunking {

  /** Chunk rows (id, chunk_idx, n_tokens, chunk_text) for every
    * document with at least one word.
    *
    * Chunks start at word offsets 0, stride, 2*stride, …; each takes
    * up to `chunkSize` words (the last chunk may be shorter). A doc
    * with <= chunkSize words yields exactly one chunk; an empty doc
    * yields none. chunk count = 1 + ceil((len - chunkSize) / stride)
    * for len > chunkSize — the formula is mirrored verbatim in the
    * q79 DuckDB oracle.
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
            s"stride must be in [1, chunkSize], got $stride")
    val len = size(col("ws")).cast("long")
    val nChunks = when(len === 0, lit(0L))
      .when(len <= chunkSize, lit(1L))
      .otherwise(lit(1L) +
        ceil((len - chunkSize).cast("double") / stride.toDouble).cast("long"))
    df.select(col(idCol).as("id"), TextOps.words(col(textCol)).as("ws"))
      .withColumn("n_chunks", nChunks)
      .filter(col("n_chunks") > 0)
      .select(col("id"), col("ws"),
              explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk",
                  slice(col("ws"), (col("chunk_idx") * stride + 1).cast("int"),
                        lit(chunkSize)))
      .select(col("id"), col("chunk_idx"),
              size(col("chunk")).cast("long").as("n_tokens"),
              array_join(col("chunk"), " ").as("chunk_text"))
  }
}
