package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Best-passage (snippet) extraction: for a set of query terms, the
  * densest `window`-token passage of each document — the retrieval-UX
  * step after ranking (BM25/RRF say WHICH document; this says WHERE to
  * look in it).
  *
  * Scan-stage only, zero Exchange before the final top-k: match
  * positions come from one filtered index sequence, each candidate
  * window is anchored at a match position (an optimal window can
  * always be slid right until its first hit is its start, so
  * match-anchored enumeration is lossless), the per-window hit count
  * is a lambda over the (short) match-position list, and the best
  * window is an in-plan `array_max` over (hits, −start) structs —
  * O(matches²) per document with no explode, no per-doc window
  * function, no shuffle. Documents containing no term are dropped.
  */
object Snippet {

  /** Output per matching doc: `start` (0-based token offset), `hits`
    * (query-term tokens inside the window), `snippet` (the window's
    * text); top `topK` docs by (hits desc, id). Tokens are matched
    * lowercased, like [[Retrieval.bm25TopK]]. */
  def bestPassage(df: DataFrame, textCol: String, idCol: String,
                  terms: Seq[String], window: Int = 10,
                  topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(window >= 1, s"window must be >= 1, got $window")
    val termArr = array(terms.map(t => lit(t.toLowerCase)): _*)
    val toks = split(lower(col(textCol)), " ")
    val idx = sequence(lit(0), size(toks) - 1)
    val matchPos = filter(idx, i => array_contains(termArr, element_at(toks, i + 1)))
    val best = array_max(transform(matchPos, p => struct(
      size(filter(matchPos, q => q >= p && q < p + window)).as("hits"),
      (-p).as("ns"))))
    df.select(col(idCol), toks.as("__toks"), best.as("__best"))
      .filter(col("__best").isNotNull)
      .select(col(idCol),
        (-col("__best.ns")).cast("long").as("start"),
        col("__best.hits").cast("long").as("hits"),
        concat_ws(" ", slice(col("__toks"), -col("__best.ns") + 1, lit(window)))
          .as("snippet"))
      .orderBy(col("hits").desc, col(idCol))
      .limit(topK)
  }
}
