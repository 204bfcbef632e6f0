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
    // fused one-pass kernel (HashOps.chunks): text -> array of
    // (chunk_idx, n_tokens, chunk_text) structs, inlined. Rows are
    // byte-identical to the former words/explode/slice/array_join
    // chain (spec-pinned), which copied the FULL word array into every
    // generated chunk row — O(words x chunks) moved bytes per doc
    // where the chunks themselves are O(chunkSize x chunks).
    df.select(col(idCol).as("id"),
              inline(HashOps.chunks_col(col(textCol), chunkSize, stride)))
  }
}
