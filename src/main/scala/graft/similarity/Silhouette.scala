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

  /** Davies–Bouldin index with SQUARED distances (documented variant:
    * the classic index uses Euclidean means, whose per-point square
    * roots would break integer exactness; squared scatters preserve
    * the ranking this audit is read for): per label i,
    * s_i = mean fp-distance² of members to their centroid, and
    * R_i = max_{j≠i} (s_i + s_j)/d²(c_i, c_j) — lower is better.
    * One row per label: `label`, `n`, `s2` (rounded 6), `r_max`
    * (rounded 6, null for a single-label corpus), `worst_other` (the
    * label attaining the max, ties to the SMALLEST label id).
    *
    * Scale shape: reuses [[simplified]]'s fixed-point centroid
    * aggregate; scatters are one exact-integer groupBy; the R matrix
    * is |labels|² rows of scalar arithmetic — corpus-independent.
    */
  def daviesBouldin(emb: DataFrame, embCol: String,
                    labelCol: String): DataFrame = {
    val fp = emb.select(col(labelCol).cast("long").as("label"),
        transform(col(embCol),
          v => round(v.cast("double") * 1e6).cast("long")).as("__vfp"))
      .localCheckpoint()
    val cent = fp.select(col("label"), posexplode(col("__vfp")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("c"))
    val carr = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("__carr"))
      .localCheckpoint() // scatter join + the centroid-pair matrix
    def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    val scatter = fp.join(broadcast(carr), "label")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        (sum(dist2(col("__vfp"), col("__carr"))).cast("double")
          / count(lit(1))).as("__s2"))
      .localCheckpoint() // both sides of the pair matrix
    val pairs = scatter.select(col("label"), col("__s2"))
      .join(carr, "label")
      .crossJoin(broadcast(scatter.select(col("label").as("__lj"), col("__s2").as("__sj"))
        .join(carr.select(col("label").as("__lj"), col("__carr").as("__cj")), "__lj")))
      .filter(col("label") =!= col("__lj"))
      .select(col("label"), col("__lj"),
        ((col("__s2") + col("__sj"))
          / dist2(col("__carr"), col("__cj")).cast("double")).as("__r"))
    val best = pairs.groupBy(col("label"))
      .agg(max_by(struct(col("__r"), col("__lj")),
        struct(col("__r"), (-col("__lj")).as("__neg"))).as("__b"))
      .select(col("label"), col("__b.__r").as("__rmax"),
        col("__b.__lj").as("worst_other"))
    scatter.join(best, Seq("label"), "left")
      .select(col("label"), col("n"),
        round(col("__s2") + lit(1e-12), 6).as("s2"),
        round(col("__rmax") + lit(1e-12), 6).as("r_max"),
        col("worst_other"))
  }

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
