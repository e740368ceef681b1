package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust statistics gates — the numeric-column analogue of the text
  * quality filters: winsorization (clip to in-group percentile bounds)
  * and median/MAD outlier flagging, the two standard cleanups before a
  * numeric feature feeds training.
  *
  * Scale design: both operators reduce the corpus to a GROUP-SIZED
  * bounds table (one aggregate), broadcast it back, and apply pure
  * row-local arithmetic — the corpus itself never shuffles. The exact
  * `percentile` aggregate buffers per-group value counts, which is fine
  * for the bounded group cardinality these gates run at (per-language /
  * per-source); above that swap in `approx_percentile` — same plan
  * shape, bound-oracle pattern (the swap changes no code here but the
  * aggregate name).
  */
object Robust {

  /** Append `<valCol>_w`: `valCol` clipped to the [lo, hi] in-group
    * percentiles. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    // one percentile buffer per group (array form), not one per bound
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, array(${lo}D, ${hi}D))").as("__b"))
      .select(col(groupCol), element_at(col("__b"), 1).as("__lo"),
        element_at(col("__b"), 2).as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn(s"${valCol}_w",
        least(greatest(col(valCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Append `robust_z` (0.6745 · (x − median) / MAD, null when MAD = 0)
    * and `is_outlier` (|robust_z| > k). Median/MAD instead of mean/std:
    * the flag itself must not be dragged by the outliers it hunts.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
                     k: Double = 3.5): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, 0.5D)").as("__med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valCol - __med), 0.5D)").as("__mad"))
    val z = when(col("__mad") > 0,
      lit(0.6745) * (col(valCol) - col("__med")) / col("__mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("robust_z", z)
      .withColumn("is_outlier", coalesce(abs(col("robust_z")) > k, lit(false)))
      .drop("__med", "__mad")
  }
}
