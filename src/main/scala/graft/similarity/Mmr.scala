package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * greedily pick the candidate maximizing
  * λ·sim(candidate, query) − (1−λ)·max_{chosen} sim(candidate, chosen)
  * — the classic diversity-aware rerank that sits above BM25/ANN
  * retrieval: pure top-k returns five paraphrases of the same document,
  * MMR returns one of them plus four complements.
  *
  * Same distributed-greedy shape as [[KCenter.greedySeeds]]: each of
  * the k rounds is ONE corpus scan with the chosen vectors compiled in
  * as plan literals and a 1-row `max_by` (ties to lowest id, chosen
  * excluded). Cosines are rounded to 6 decimals (+1e-12 tie nudge)
  * BEFORE the score combination — the repo's standard float-parity
  * grid — so the greedy trajectory is exactly engine-replayable; λ and
  * 1−λ are both evaluated in-plan with the same IEEE subtraction the
  * oracle writes.
  */
object Mmr {

  final case class Pick(rank: Int, id: Long, vec: Seq[Double], score: Double)

  def rerank(df: DataFrame, embCol: String, idCol: String,
             queryVec: Seq[Double], k: Int, lambda: Double): Seq[Pick] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import org.apache.spark.sql.graft.bridge.toColumn
    import graft.functions.DotProduct.dotProduct

    val qLit = toColumn(CatLit.create(queryVec.toArray, ArrayType(DoubleType, false)))
    val data = df.select(col(idCol).cast("long").as("__id"),
      Similarity.toDouble(col(embCol)).as("__e"))
    def cosTo(v: org.apache.spark.sql.Column) =
      round(dotProduct(col("__e"), v)
        / (Similarity.norm(col("__e")) * Similarity.norm(v)) + lit(1e-12), 6)
    val rel = cosTo(qLit)

    var picks = Vector.empty[Pick]
    while (picks.length < k) {
      val red =
        if (picks.isEmpty) lit(0.0)
        else {
          val chLit = toColumn(CatLit.create(picks.map(_.vec.toArray).toArray,
            ArrayType(ArrayType(DoubleType, false), false)))
          array_max(transform(chLit, c => cosTo(c)))
        }
      val score = lit(lambda) * rel - (lit(1.0) - lit(lambda)) * red
      val chosen = picks.map(_.id)
      val row = data.filter(!col("__id").isin(chosen: _*))
        .agg(max_by(struct(col("__id"), col("__e"), score.as("__s")),
          struct(score, -col("__id"))))
        .head().getStruct(0)
      picks :+= Pick(picks.length, row.getLong(0), row.getSeq[Double](1),
        row.getDouble(2))
    }
    picks
  }
}
