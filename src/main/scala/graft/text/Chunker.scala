package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding token-window document chunking — the pretraining / RAG
  * "context window" splitter. Each document of n tokens yields chunks
  * starting at 0, stride, 2*stride, ... while the start is inside the
  * document; a chunk carries up to `window` tokens, so consecutive
  * chunks overlap by (window - stride) tokens.
  *
  * Scale design: chunking is a pure map over the corpus — tokenize,
  * enumerate starts with `sequence`, `posexplode` — so the whole
  * operator lives in the scan stage with ZERO shuffle. At 100 TB the
  * cost is one pass over the text bytes; output partitioning inherits
  * the input's, so a downstream per-chunk transform (embedding,
  * tokenizer) pipelines without an exchange.
  */
object Chunker {

  /** Chunk `textCol` (whitespace-tokenized) into `window`-token pieces
    * every `stride` tokens. Output: idCol, chunk_id (0-based, long),
    * token_start (long), n_tokens (long), chunk_text.
    */
  def chunks(df: DataFrame, textCol: String, idCol: String,
             window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    // Starts 0, stride, ... up to the last multiple of stride < n — the
    // sequence bound floor((n-1)/stride) keeps every start in-document
    // (an empty doc still yields one empty chunk via the greatest guard).
    val starts = transform(
      sequence(lit(0),
        greatest(floor((size(col("__toks")) - 1) / stride).cast("int"), lit(0))),
      i => i * stride)
    val chunk = slice(col("__toks"), col("token_start") + 1, lit(window))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"), posexplode(starts))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "token_start")
      .select(col(idCol), col("chunk_id").cast("long"),
        col("token_start").cast("long"),
        size(chunk).cast("long").as("n_tokens"),
        array_join(chunk, " ").as("chunk_text"))
  }
}
