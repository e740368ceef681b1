package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary building and out-of-vocabulary scoring — the
  * coverage check run before committing to a tokenizer/vocab: build the
  * top-k token vocabulary by corpus frequency, then score each document
  * by the fraction of its tokens that fall outside it.
  *
  * Scale design: the vocabulary is one explode + hash aggregate (map-
  * side partials collapse each partition to its distinct tokens before
  * the shuffle) followed by a driver-bounded top-k (k rows, not the
  * token table). OOV scoring then BROADCASTS the k-row vocab against
  * the exploded corpus — a map-side hash probe, no shuffle of the
  * corpus — and re-aggregates per document on the same doc id the
  * explode preserved. Total: two narrow shuffles (token counts, per-doc
  * re-group) regardless of corpus size.
  */
object Vocab {

  /** Top-k tokens by frequency, ties broken by token text — a total
    * order, so the vocabulary is deterministic across engines/runs.
    * Output: token, cnt (long), rank (1-based, long).
    */
  def topK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
      .select(col("token"), col("cnt"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("token"))).cast("long").as("rank"))
  }

  /** Per-document OOV rate against `vocab` (a df with a `token`
    * column, broadcast — intended to be small, e.g. `topK`'s output).
    * Output: idCol, n_tokens, oov_tokens (longs), oov_rate (rounded).
    */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
              vocab: DataFrame): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(vocab.select(col("token").as("__v"))),
        col("token") === col("__v"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__v").isNull, lit(1))).as("oov_tokens"))
      .select(col(idCol), col("n_tokens"), col("oov_tokens"),
        round(col("oov_tokens").cast("double") / col("n_tokens"), 6).as("oov_rate"))
}
