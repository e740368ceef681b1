package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): rows no other row dominates, where
  * row j dominates row i iff x_j ≤ x_i ∧ y_j ≥ y_i with at least one
  * inequality strict (x minimized, y maximized — e.g. "best quality at
  * every length budget"). Incomparable duplicates (equal x AND y) are
  * all kept: neither dominates.
  *
  * The naive formulation is a quadratic dominance self-join; the sorted
  * formulation needs the GLOBAL (x asc, y desc) order, which as a bare
  * unpartitioned window is a single-task sort. This one is distributed
  * and exact:
  *
  *   1. hash rows into `buckets` groups and take each group's LOCAL
  *      skyline with a per-bucket window — any globally dominated row is
  *      dominated by some global-frontier row, every global-frontier row
  *      survives its own bucket, so the union of local skylines contains
  *      the true frontier;
  *   2. re-run the same test on the survivors (≤ buckets × frontier
  *      size, the collect-k-centroids regime) in one partition.
  *
  * The per-bucket dominance test is ONE running aggregate, not a join:
  * under (x asc, y desc, id) order every preceding row has x' ≤ x, so
  * "some preceding row dominates" reduces to y' > y ∨ (y' = y ∧ x' < x)
  * — exactly lexicographic struct(y', −x') > struct(y, −x), i.e.
  * max(struct(y, −x)) over the preceding frame beats the current row.
  */
object Skyline {

  private def localSkyline(df: DataFrame, part: Seq[Column],
                           x: String, y: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(part: _*)
      .orderBy(col(x).asc, col(y).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val key = struct(col(y), -col(x))
    df.withColumn("__best", max(key).over(w))
      .filter(col("__best").isNull || !(col("__best") > key))
      .drop("__best")
  }

  /** The Pareto-optimal rows of `df` under (minimize `xCol`, maximize
    * `yCol`). `idCol` only breaks sort ties — it never affects
    * membership. Exact for any numeric x/y; output order unspecified.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String, idCol: String,
                buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val bucketed = df.withColumn("__b", pmod(xxhash64(col(idCol)), lit(buckets.toLong)))
    val locals = localSkyline(bucketed, Seq(col("__b")), xCol, yCol, idCol)
    localSkyline(locals.withColumn("__b", lit(0L)), Seq(col("__b")), xCol, yCol, idCol)
      .drop("__b")
  }
}
