package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM Viterbi subword segmentation — the SentencePiece
  * INFERENCE shape: given a subword vocabulary with occurrence counts
  * (here the BPE-trained vocabulary, [[Bpe.vocabulary]]), find each
  * word's minimum-cost decomposition under cost(sym) = −ln P(sym).
  * This completes the tokenizer family: BPE answers "what vocabulary",
  * Viterbi answers "what's the best segmentation under it" — and the
  * cost is the word's negative log-likelihood, the quantity mixture
  * builders threshold on.
  *
  * Layout: the end-of-word marker `</w>` collapses to the single char
  * U+0001 (cannot occur in corpus text — the Bpe separator argument),
  * so every vocabulary symbol is a contiguous substring of
  * word + U+0001 and the DP runs on plain substrings. The DP itself is
  * a per-row fold over positions: best(i) = min_j best(j) +
  * cost(w[j..i]), each candidate ONE addition of two deterministic
  * doubles (costs are 1e-6-grid snapped), so min decisions replay
  * bit-for-bit in SQL (the oracle unrolls positions as CTEs).
  *
  * Scale shape: the cost table is vocabulary-sized (chars + nMerges —
  * bounded by construction) and ships as a plan literal MAP; the DP is
  * a zero-shuffle scan-stage fold over the DISTINCT-word table, O(n²)
  * per word in its own ≤ maxLen length, never corpus-scaled. Words
  * whose final position is unreachable would emit +inf; corpus words
  * can't be (their own merged decomposition is in the vocabulary).
  */
object UnigramLm {

  val Eow = "\u0001"

  /** (symbol → cost) with `</w>` collapsed: cost = −round₆(ln(n/total)
    * + 1e-12), computed IN-PLAN so the rounding semantics are exactly
    * Spark's (= DuckDB's). Vocabulary-sized collect. */
  def costTable(vocab: DataFrame, symCol: String, cntCol: String)
      : Seq[(String, Double)] = {
    val tot = vocab.agg(sum(col(cntCol)).as("t"))
    vocab.crossJoin(broadcast(tot))
      .select(regexp_replace(col(symCol), "</w>", Eow).as("sym"),
        (-round(log(col(cntCol).cast("double") / col("t").cast("double"))
          + lit(1e-12), 6)).as("cost"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
  }

  /** Viterbi cost per distinct word (word table from
    * [[Bpe.wordTable]]'s construction): word, cnt, n_chars,
    * viterbi_cost. `maxLen` fail-fasts when a word (+ marker) outgrows
    * the documented DP depth — the SQL oracle unrolls exactly that many
    * positions, so engine and oracle change together. */
  def viterbiSegment(words: DataFrame, costs: Seq[(String, Double)],
                     maxLen: Int = 12): DataFrame = {
    require(costs.nonEmpty, "viterbiSegment: empty cost table")
    val longest = words.agg(max(length(col("word")))).head
    if (!longest.isNullAt(0)) require(longest.getInt(0) + 1 <= maxLen,
      s"viterbiSegment: a word spans ${longest.getInt(0) + 1} DP positions " +
        s"(> maxLen=$maxLen) — raise maxLen and the oracle unroll together")
    val costMap = map_from_arrays(
      typedLit(costs.map(_._1)), typedLit(costs.map(_._2)))
    val wx = concat(col("word"), lit(Eow))
    val n = length(col("word")) + lit(1)
    val best = aggregate(sequence(lit(1), n), array(lit(0.0)),
      (bst: Column, i: Column) => concat(bst, array(array_min(
        transform(sequence(lit(0), i - 1), j =>
          element_at(bst, j + 1) + coalesce(
            element_at(costMap, wx.substr(j + lit(1), i - j)),
            lit(1e18)))))))
    words.select(col("word"), col("cnt"),
        length(col("word")).cast("long").as("n_chars"),
        round(element_at(best, n + 1) + lit(1e-12), 6).as("viterbi_cost"))
  }
}
