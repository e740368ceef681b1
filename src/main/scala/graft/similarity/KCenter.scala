package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gonzalez greedy k-center seeding: repeatedly pick the point whose
  * minimum squared distance to the already-chosen set is LARGEST — the
  * classic 2-approximation for the k-center objective and the standard
  * "maximally diverse exemplars" draw for curation (few-shot pools,
  * eval-slice seeds, coverage-first subset selection). Where sampling
  * asks "representative?", k-center asks "is every region within reach
  * of a pick?".
  *
  * Deterministic and engine-replayable: the first seed is the lowest
  * id, each argmax breaks ties to the lowest id, and already-chosen ids
  * are excluded (so even an all-duplicates corpus yields k distinct
  * picks). Each of the k−1 rounds is ONE scan with the chosen vectors
  * compiled in as a plan literal (the [[Ivf.assignCell]] trick) and a
  * single 1-row `max_by` aggregate — the driver holds k vectors, the
  * IVF-centroid regime, and nothing corpus-sized ever moves.
  */
object KCenter {

  /** rank 0..k−1 in pick order; `dist` = the max-min squared distance
    * that won the pick (0.0 for the first seed). */
  final case class Seed(rank: Int, id: Long, vec: Seq[Double], dist: Double)

  def greedySeeds(df: DataFrame, embCol: String, idCol: String, k: Int): Seq[Seed] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val data = df.select(col(idCol).cast("long").as("__id"),
      Similarity.toDouble(col(embCol)).as("__e"))
    val first = data.orderBy(col("__id")).limit(1).head()
    var seeds = Vector(Seed(0, first.getLong(0), first.getSeq[Double](1), 0.0))
    while (seeds.length < k) {
      val litMat = {
        import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        org.apache.spark.sql.graft.bridge.toColumn(
          CatLit.create(seeds.map(_.vec.toArray).toArray,
            ArrayType(ArrayType(DoubleType, false), false)))
      }
      // the codegen centroid-distance loop ([[graft.functions
      // .CentroidDists]] — bit-identical ascending fold) replaces the
      // interpreted per-seed aggregate(zip_with) body; d is referenced
      // twice in the max_by below, and the interpreted form re-ran the
      // whole seeds x dim fold for each reference
      val d = array_min(
        graft.functions.CentroidDists.centroidDists(col("__e"), litMat))
      val chosen = seeds.map(_.id)
      val row = data.filter(!col("__id").isin(chosen: _*))
        .agg(max_by(struct(col("__id"), col("__e"), d.as("__d")),
          struct(d, -col("__id"))))
        .head().getStruct(0)
      seeds :+= Seed(seeds.length, row.getLong(0), row.getSeq[Double](1),
        row.getDouble(2))
    }
    seeds
  }
}
