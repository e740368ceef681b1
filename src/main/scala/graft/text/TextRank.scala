package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): rank corpus
  * terms by weighted PageRank over the token co-occurrence graph —
  * terms that co-occur with many well-connected terms are keywords.
  * The graph-centrality complement to frequency-based q_top_tokens and
  * information-theoretic q_pmi.
  *
  * Dataflow: adjacent-token pairs are generated in the SCAN stage
  * (zip_with over the shifted token array — no posexplode self-join),
  * symmetrized, and count-aggregated into a vocabulary²-bounded edge
  * list (map-side combined; in practice |observed bigrams| ≪ vocab²).
  * [[graft.graph.PageRank.weightedPageRank]] then runs its
  * per-iteration join + re-aggregate over the vocabulary-sized rank
  * vector, and the top-k is a TakeOrderedAndProject on the ROUNDED
  * rank (ties to the lexicographically first term) — deterministic
  * under both engines' double-sum orders. Nothing corpus-sized
  * shuffles more than once.
  */
object TextRank {

  /** Top-`topK` keywords: `term`, `textrank` (rounded 6), `rk`.
    * Tokens shorter than `minLen` characters drop (the cheap
    * stopword-free guard — grammatical glue is short); self-loop
    * bigrams (repeated token) drop.
    */
  def keywords(docs: DataFrame, textCol: String, minLen: Int = 3,
               iterations: Int = 3, topK: Int = 20): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val w = filter(split(lower(col(textCol)), " "), t => length(t) >= minLen)
    val pairs = docs.select(w.as("__w"))
      .select(explode(zip_with(
        slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))),
        slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0))),
        (a, b) => struct(a.as("s"), b.as("d")))).as("__p"))
      .select(col("__p.s").as("__s"), col("__p.d").as("__d"))
      .filter(col("__s") =!= col("__d"))
      .localCheckpoint() // both union directions read it: tokenize once
    val edges = pairs
      .unionByName(pairs.select(col("__d").as("__s"), col("__s").as("__d")))
      .groupBy(col("__s"), col("__d"))
      .agg(count(lit(1)).as("__wt"))
      .localCheckpoint() // feeds the node set AND every PR iteration
    val nodes = edges.select(col("__s").as("term")).distinct()
    val ranked = graft.graph.PageRank.weightedPageRank(
      edges, "__s", "__d", "__wt", nodes, "term", iterations)
    // TakeOrderedAndProject does the global top-k (no vocab-sized
    // single-partition sort); the rank window then runs over topK rows
    ranked
      .select(col("node").as("term"), col("pagerank").as("textrank"))
      .orderBy(col("textrank").desc, col("term"))
      .limit(topK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("textrank").desc, col("term"))).cast("long"))
  }
}
