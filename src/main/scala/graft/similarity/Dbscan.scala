package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN over a precomputed ε-neighborhood graph: density-based
  * clustering with explicit noise — the curation view [[graft.dedup
  * .Dedup.clusters]] (plain connected components) cannot give, because
  * CC happily chains sparse one-off matches into giant clusters while
  * DBSCAN only propagates through CORE points (dense neighborhoods) and
  * labels the sparse periphery border/noise.
  *
  * Deterministic variant: classic DBSCAN's border assignment is
  * scan-order-dependent (a border point joins whichever core reached it
  * first); here a border point joins the MINIMUM cluster label among
  * its core neighbors, making the output partitioning-invariant and
  * oracle-replayable. Core check counts neighbors EXCLUDING the point
  * itself (minPts = 3 means "3 other points within ε").
  *
  * Dataflow: degree aggregate → core flag → core-core edge filter →
  * [[graft.dedup.Dedup.clusters]] label propagation on the core
  * subgraph → one border join + min aggregate. Everything is
  * neighborhood-local; the ε-pair generator (e.g.
  * [[Similarity.cosinePairs]]) is the only quadratic-risk stage and is
  * bucket-capped there.
  */
object Dbscan {

  /** @param ids   one row per point (the id universe, including
    *              isolated points that appear in no pair)
    * @param pairs undirected ε-neighbor pairs (`aCol`, `bCol`), one row
    *              per unordered pair
    * @return (`id`, `role` ∈ core|border|noise, `cluster`; noise gets
    *         cluster −1; clusters are labeled by their minimum core id)
    */
  def dbscan(ids: DataFrame, idCol: String, pairs: DataFrame,
             aCol: String, bCol: String, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // sym is consumed by FOUR downstream subtrees (core degree agg, the
    // two core-edge semi joins, borderClusters, and clusters' own edge
    // build) — without materialization Spark re-evaluates the ε-pair
    // generator feeding `pairs` (the dominant stage: a capped cosine
    // self-join) once per consumer. Same discipline as Dedup.clusters'
    // edges persist; at cluster scale this is a reliable-storage
    // checkpoint() instead.
    val sym = pairs.select(a.as("src"), b.as("dst"))
      .unionAll(pairs.select(b.as("src"), a.as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    val core = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minPts).select(col("src").as("core_id"))
    // cluster labels propagate ONLY through core-core edges
    val coreEdges = sym
      .join(core, sym("src") === core("core_id"), "left_semi")
      .join(core, sym("dst") === core("core_id"), "left_semi")
    val coreClusters = graft.dedup.Dedup.clusters(
      core.select(col("core_id")), coreEdges, "core_id", "src", "dst")
    // border = non-core with >= 1 core neighbor; joins the minimum
    // neighboring core cluster (deterministic stand-in for classic
    // DBSCAN's first-toucher assignment)
    val borderClusters = sym
      .join(core.withColumnRenamed("core_id", "dst_core"),
        sym("dst") === col("dst_core"), "inner")
      .join(coreClusters.withColumnRenamed("id", "cc_id"),
        col("dst_core") === col("cc_id"), "inner")
      .join(core, sym("src") === core("core_id"), "left_anti")
      .groupBy(col("src")).agg(min(col("cluster")).as("cluster"))
    val universe = ids.select(col(idCol).cast("long").as("id"))
    universe
      .join(coreClusters.select(col("id"), col("cluster").as("core_cluster")),
        Seq("id"), "left")
      .join(borderClusters.select(col("src").as("id"),
        col("cluster").as("border_cluster")), Seq("id"), "left")
      .select(col("id"),
        when(col("core_cluster").isNotNull, "core")
          .when(col("border_cluster").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("core_cluster"), col("border_cluster"), lit(-1L)).as("cluster"))
  }
}
