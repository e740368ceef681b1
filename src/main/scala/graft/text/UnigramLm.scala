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
  * bounded by construction) and ships once per expression instance
  * ([[graft.functions.ViterbiCost]], a codegen primitive-double DP);
  * the DP is a zero-shuffle scan-stage loop over the DISTINCT-word
  * table, O(n²) per word in its own ≤ maxLen length, never
  * corpus-scaled. Words whose final position is unreachable would emit
  * +inf; corpus words can't be (their own merged decomposition is in
  * the vocabulary).
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
    // the old map_from_arrays literal failed fast on duplicate symbols
    // (mapKeyDedupPolicy EXCEPTION); keep that contract
    require(costs.map(_._1).distinct.size == costs.size,
      "viterbiSegment: duplicate symbols in the cost table")
    val longest = words.agg(max(length(col("word")))).head
    if (!longest.isNullAt(0)) require(longest.getInt(0) + 1 <= maxLen,
      s"viterbiSegment: a word spans ${longest.getInt(0) + 1} DP positions " +
        s"(> maxLen=$maxLen) — raise maxLen and the oracle unroll together")
    // codegen DP ([[graft.functions.ViterbiCost]]): one primitive-double
    // loop per word replacing the interpreted fold-of-folds (which boxed
    // every candidate and reallocated the best-array per position); the
    // cost table ships once per expression instead of as a per-row map
    // literal lookup. Candidates, fold order, absent-symbol 1e18, and
    // null propagation are identical — bit-for-bit the same costs.
    val wx = concat(col("word"), lit(Eow))
    val best = graft.functions.ViterbiCost.viterbiCost(wx, costs.toMap)
    words.select(col("word"), col("cnt"),
        length(col("word")).cast("long").as("n_chars"),
        round(best + lit(1e-12), 6).as("viterbi_cost"))
  }
}
