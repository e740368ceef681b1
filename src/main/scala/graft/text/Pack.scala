package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing bookkeeping for LLM pretraining: documents are
  * concatenated in a deterministic order and the token stream is chunked
  * into fixed-length training sequences (the standard concat-then-chunk
  * recipe). This operator computes, for every document, WHERE it lands:
  * its token offset in the group's stream and the first/last training
  * chunk it touches — the metadata a packing writer or an attribution
  * ("which docs fed sequence i") query needs.
  *
  * 100 TB shape: one window shuffle per `groupCol` shard ordered by
  * `orderCol`. Groups are the packing unit (a shard/language/source), so
  * partitions are shard-sized by construction — sharding the corpus into
  * enough groups IS the scale knob, exactly as in production packing
  * jobs. All arithmetic is integral (`div`), exact past 2^53 tokens.
  */
object Pack {

  /** Per-doc chunk assignment: (group, order, n_tokens, tok_start,
    * chunk_first, chunk_last) with chunks of `seqLen` tokens numbered
    * from 0 within each group. A doc spans chunk_last - chunk_first + 1
    * chunks; docs with zero tokens get chunk_last < chunk_first and
    * should be filtered upstream.
    */
  def chunkAssignments(df: DataFrame, groupCol: String, orderCol: String,
                       tokensCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col(tokensCol).cast("long")
    df.withColumn("__cum", sum(n).over(w))
      .select(col(groupCol), col(orderCol), n.as("n_tokens"),
        (col("__cum") - n).as("tok_start"))
      .select(col(groupCol), col(orderCol), col("n_tokens"), col("tok_start"),
        expr(s"tok_start div $seqLen").as("chunk_first"),
        expr(s"(tok_start + n_tokens - 1) div $seqLen").as("chunk_last"))
  }
}
