package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed sampling.
  *
  * `sample(fraction)` / `stat.sampleBy` are seed-reproducible only for a
  * fixed partitioning — a repartitioned rerun draws different rows, which
  * breaks audit/replay of a training-data snapshot. Hash-rank sampling is
  * reproducible under ANY partitioning: rank rows by a hash of their key
  * and keep the k smallest per stratum (a bottom-k sketch). It is also
  * merge-able — bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) —
  * so samples of shards combine without re-scanning the shards.
  */
object Sampling {

  /** The k rows with smallest md5(key) per group — a uniform,
    * deterministic, merge-able sample of k rows per stratum. Runs on the
    * [[graft.plans.TopKPerGroup]] physical operator (bounded map-side
    * heaps), so the exchange carries at most k rows per (group,
    * partition) instead of the whole table; `keyCol` ascending breaks the
    * (practically impossible) hash-collision tie to keep the order total.
    * Appends `rn` (1-based rank within the sample). Requires
    * `GraftExtensions` on the session.
    */
  def bottomKByHash(df: DataFrame, groupCols: Seq[String], keyCol: String,
                    k: Int): DataFrame = {
    val hashed = df.withColumn("__h", md5(col(keyCol).cast("string")))
    graft.plans.TopKPerGroup
      .perGroup(hashed, groupCols, "__h", keyCol, k, desc = false)
      .drop("__h")
  }
}
