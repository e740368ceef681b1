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
  * match-anchored enumeration is lossless), and the best window is an
  * in-plan `array_max` over (hits, −start) structs — no explode, no
  * per-doc window function, no shuffle. The per-window hit count
  * exploits that `matchPos` is SORTED: token positions are strictly
  * increasing, so a `window`-token span holds at most `window`
  * matches and the count is a filter over `slice(matchPos, i+1,
  * window)` — O(matches · window) per document, not O(matches²) (the
  * all-positions filter made q_snippet the single most expensive
  * bench query on common terms: 29 s median at sf0.1, where the
  * sliced form does the same exact arithmetic on ≤ window elements).
  * Documents containing no term are dropped.
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
    // Higher-order functions run INTERPRETED (no whole-stage codegen),
    // and an interpreted lambda body re-evaluates every subtree it
    // captures on EVERY element — with split/sequence inlined into the
    // lambdas, each anchor re-tokenized the document (m·n regex splits
    // per row; 29 s at sf0.1). Materializing the token and match-
    // position arrays as real columns makes every lambda reference an
    // ATTRIBUTE read (CollapseProject keeps non-cheap multi-referenced
    // aliases in their own projection), so the document tokenizes once
    // and matchPos is computed once per row.
    val toks = split(lower(col(textCol)), " ")
    val idx = sequence(lit(0), size(col("__toks")) - 1)
    val matchPos = filter(idx,
      i => array_contains(termArr, element_at(col("__toks"), i + 1)))
    // q >= p is implied: the slice starts AT p's own (1-based) position;
    // token positions are strictly increasing, so a window-token span
    // holds at most `window` matches — O(matches·window), not matches²
    val best = array_max(transform(col("__mp"), (p, i) => struct(
      size(filter(slice(col("__mp"), i + 1, lit(window)), q => q < p + window)).as("hits"),
      (-p).as("ns"))))
    // No-match documents surface as a null __best. They are dropped
    // AFTER the top-k, not before: a pre-limit filter gets predicate-
    // pushed below the projections with every alias re-substituted, so
    // the scan would re-evaluate the whole interpreted HOF tree per row
    // as a DataFilter (this exact inlining was the 29 s). Nulls sort
    // after every real hit count (DESC NULLS LAST), so top-k-then-drop
    // returns exactly the matched top-<=k, and the post-limit filter
    // touches <= topK rows.
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"), matchPos.as("__mp"))
      .select(col(idCol), col("__toks"), best.as("__best"))
      .select(col(idCol),
        (-col("__best.ns")).cast("long").as("start"),
        col("__best.hits").cast("long").as("hits"),
        concat_ws(" ", slice(col("__toks"), -col("__best.ns") + 1, lit(window)))
          .as("snippet"))
      .orderBy(col("hits").desc_nulls_last, col(idCol))
      .limit(topK)
      .filter(col("hits").isNotNull)
  }
}
