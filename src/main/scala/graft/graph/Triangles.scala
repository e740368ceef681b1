package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients over an
  * undirected edge list — the third leg of the similarity-graph
  * toolkit next to [[PageRank]] and the connected-components pass in
  * [[graft.dedup.Dedup]]: a near-dup cluster is a near-clique, so the
  * clustering coefficient separates "dense duplicate blob" nodes from
  * "bridge" nodes that chain otherwise-unrelated documents together.
  *
  * Algorithm: degree orientation (Suri & Vassilvitskii 2011 / the
  * "forward" algorithm). Every edge is directed from its lower-
  * (degree, id) endpoint to the higher, wedges join on the shared
  * SOURCE, and a wedge closes iff its (v, w) leg exists as an oriented
  * edge. Each triangle is found exactly once, and — the scale point —
  * the join fan-out per node is its oriented OUT-degree, which is
  * O(√m) for any graph: a hub of degree d contributes d wedges as a
  * source only if d of its neighbors all out-rank it, which the
  * orientation forbids. No per-node adjacency list is ever buffered;
  * everything is three hash joins + one explode-aggregate.
  */
object Triangles {

  /** Per-node degree, triangle count, and local clustering coefficient
    * 2T/(deg·(deg−1)) (0 for degree-1 nodes; +1e-12 before rounding —
    * the coefficient is rational, and exact decimal ties must round the
    * same way in every engine). Input edges are normalized (undirected,
    * self-loops dropped, duplicates collapsed) before counting.
    * Output: `node_id`, `degree`, `triangles`, `clustering`.
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    graft.operators.Ids.requireIntegral(edges, aCol, "node")
    graft.operators.Ids.requireIntegral(edges, bCol, "node")
    val e = edges
      .select(least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient low (deg, id) -> high; a < b already, so a wins degree ties
    val o = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("s"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("t"),
        when(col("da") <= col("db"), col("db")).otherwise(col("da")).as("dt"))
    // wedges around a shared source, legs ordered by the same (deg, id)
    // total order the orientation used — the closing edge, if present,
    // is then oriented exactly v -> w
    val x = o.select(col("s"), col("t").as("wv"), col("dt").as("dv"))
    val y = o.select(col("s"), col("t").as("ww"), col("dt").as("dw"))
    val wedges = x.join(y, Seq("s"))
      .filter(col("dv") < col("dw") || (col("dv") === col("dw") && col("wv") < col("ww")))
    val tri = wedges
      .join(o.select(col("s").as("wv"), col("t").as("ww")), Seq("wv", "ww"))
      .select(col("s").as("u"), col("wv"), col("ww"))
    val triCounts = tri
      .select(explode(array(col("u"), col("wv"), col("ww"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("tri"))
    deg.join(triCounts, Seq("v"), "left")
      .select(col("v").as("node_id"), col("deg").as("degree"),
        coalesce(col("tri"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          round((lit(2.0) * coalesce(col("tri"), lit(0L)))
            / (col("deg") * (col("deg") - lit(1L))) + lit(1e-12), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }
}
