package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window document chunking — the retrieval/embedding
  * prep step of an LLM data pipeline (fixed-budget windows with overlap
  * so no span is split across a hard boundary without context).
  *
  * Entirely map-side: per-row expression work (split → window starts →
  * explode), zero shuffles — a 100 TB corpus chunks at scan speed and
  * the output keeps the input's partitioning. Chunk text re-joins
  * tokens with single spaces (whitespace-normalized by construction,
  * same as the tokenization every other text operator here uses).
  *
  * Window arithmetic: stride = size − overlap; starts at k·stride for
  * k < K where K = ⌈max(n − overlap, 1) / stride⌉ — one window for any
  * non-empty doc of ≤ `size` tokens, and the final window always covers
  * the tail. Empty docs yield no chunks.
  */
object Chunker {

  /** `(idCol, chunk_idx, start_tok, n_chunk_tokens, chunk_text)` — one
    * row per window of `size` tokens advancing by `size - overlap`.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val n = org.apache.spark.sql.functions.size(toks)
    // K = ceil(max(n - overlap, 1) / stride), as exact floor arithmetic
    val k = floor((greatest(n - lit(overlap), lit(1)) + lit(stride - 1))
      .cast("double") / lit(stride)).cast("int")
    docs
      .select(col(idCol), toks.as("__toks"), n.as("__n"), k.as("__k"))
      .filter(col("__n") > 0)
      .select(col(idCol),
        explode(transform(sequence(lit(0), col("__k") - 1),
          i => struct(
            i.as("chunk_idx"),
            (i * stride).as("start_tok"),
            least(col("__n") - i * stride, lit(size)).as("n_chunk_tokens"),
            array_join(slice(col("__toks"), i * stride + lit(1), lit(size)), " ")
              .as("chunk_text")))).as("__chunk"))
      .select(col(idCol), col("__chunk.chunk_idx"), col("__chunk.start_tok"),
        col("__chunk.n_chunk_tokens"), col("__chunk.chunk_text"))
  }
}
