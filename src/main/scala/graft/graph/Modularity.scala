package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a node partition over an undirected graph:
  * Q = Σ_c [ e_c/m − (D_c/(2m))² ], where m is the undirected edge
  * count, e_c the edges with both endpoints in cluster c, and D_c the
  * summed degree of c's nodes — "how many edges land inside clusters,
  * beyond what a degree-preserving random graph would put there".
  * Q ≈ 0 means the partition explains nothing; the metric turns "did
  * the dedup clustering actually find structure?" into one auditable
  * number per clustering run.
  *
  * Everything is cluster-cardinality after two label-attach hash joins:
  * the edge list is scanned once for m and once (labeled) for e_c, the
  * degree table reduces to D_c, and the Q fold runs over one row per
  * cluster. Nothing quadratic, nothing collected.
  */
object Modularity {

  /** One-row result: `m`, `intra_edges`, `n_clusters`, `q` (rounded to
    * 6 decimals). Direction/duplicate edges and self-loops are
    * normalized away; nodes absent from `labels` would null-drop — give
    * every node a label (map noise to singleton clusters first).
    */
  def modularity(pairs: DataFrame, aCol: String, bCol: String,
                 labels: DataFrame, idCol: String, clusterCol: String): DataFrame = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // e is consumed by three subtrees (m, labeled, deg); materialize the
    // normalized edge list once so the pair generator behind `pairs`
    // isn't re-evaluated per consumer (reliable checkpoint() at cluster
    // scale).
    val e = pairs.select(least(a, b).as("a"), greatest(a, b).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val lab = labels.select(col(idCol).cast("long").as("id"),
      col(clusterCol).cast("long").as("c"))
    val m = e.agg(count(lit(1)).as("m"))
    val labeled = e
      .join(lab.select(col("id").as("a"), col("c").as("ca")), Seq("a"))
      .join(lab.select(col("id").as("b"), col("c").as("cb")), Seq("b"))
    val ec = labeled.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).as("ec"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val dc = deg.join(lab, deg("n") === lab("id"))
      .groupBy(col("c")).agg(sum(col("d")).as("dc"))
    val nClusters = lab.agg(count_distinct(col("c")).as("n_clusters"))
    val perCluster = dc.join(ec, Seq("c"), "left")
      .select(col("c"), coalesce(col("ec"), lit(0L)).as("ec"), col("dc"))
      .crossJoin(broadcast(m))
      .select(col("ec"),
        (col("ec").cast("double") / col("m")
          - (col("dc").cast("double") / (lit(2) * col("m")))
          * (col("dc").cast("double") / (lit(2) * col("m")))).as("qc"))
    perCluster
      .agg(sum(col("ec")).as("intra_edges"),
        round(sum(col("qc")) + lit(1e-12), 6).as("q"))
      .crossJoin(broadcast(m))
      .crossJoin(broadcast(nClusters))
      .select(col("m"), col("intra_edges"), col("n_clusters"), col("q"))
  }
}
