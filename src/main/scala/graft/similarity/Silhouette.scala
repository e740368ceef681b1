package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simplified (centroid) silhouette — the embedding-space clustering
  * quality readout: per point, a = distance² to its OWN label
  * centroid, b = min distance² to any OTHER centroid, silhouette
  * s = (b − a)/max(a, b) ∈ [−1, 1] (negative = the point sits closer
  * to a foreign centroid than its own — a label-noise signal for
  * curation). The full silhouette's per-pair means are O(n²); the
  * centroid form is the standard linear-cost surrogate and is what
  * scales — documented as such, not passed off as the exact statistic.
  *
  * Exactness: the [[graft.SparkEntry]] q_embed_centroid fixed-point
  * discipline — components quantized to 1e-6 longs, centroids as
  * floor-divided integer means, distances as exact integer dot folds.
  * The only doubles are the final ratio (identical in any engine).
  *
  * Scale shape: one posexplode aggregate to the (label × dim) centroid
  * table, rebuilt as |labels| broadcast arrays; scoring is a scan-stage
  * zip_with fold per (point, centroid) over the |labels|-replicated
  * corpus — replication bounded by the label count.
  */
object Silhouette {

  /** Per point: idCol, `label`, `a_fp`, `b_fp` (fixed-point integer
    * distances²), `sil` (rounded 6; null for a single-label corpus —
    * no foreign centroid — or a point exactly ON both centroids).
    */
  def simplified(emb: DataFrame, embCol: String, idCol: String,
                 labelCol: String): DataFrame = {
    val fp = emb.select(col(idCol), col(labelCol).cast("long").as("label"),
        transform(col(embCol),
          v => round(v.cast("double") * 1e6).cast("long")).as("__vfp"))
      .localCheckpoint() // centroid aggregate + scoring join both read it
    val cent = fp.select(col("label"), posexplode(col("__vfp")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
    val carr = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("__carr"))
      .select(col("label").as("__clabel"), col("__carr"))
    val dist2 = aggregate(
      zip_with(col("__vfp"), col("__carr"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val scored = fp.crossJoin(broadcast(carr))
      .select(col(idCol), col("label"), col("__clabel"), dist2.as("__d2"))
    val sil = (col("b_fp") - col("a_fp")).cast("double") /
      greatest(col("a_fp"), col("b_fp")).cast("double")
    scored.groupBy(col(idCol), col("label"))
      .agg(min(when(col("__clabel") === col("label"), col("__d2"))).as("a_fp"),
        min(when(col("__clabel") =!= col("label"), col("__d2"))).as("b_fp"))
      .select(col(idCol), col("label"), col("a_fp"), col("b_fp"),
        when(col("b_fp").isNull || greatest(col("a_fp"), col("b_fp")) === 0,
          lit(null).cast("double"))
          .otherwise(round(sil + lit(1e-12), 6)).as("sil"))
  }
}
