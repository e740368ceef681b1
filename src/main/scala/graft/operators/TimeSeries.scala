package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered per-key time-series features.
  *
  * The recurrence s' = s·α + x is inherently sequential, which is why
  * naive EWMA implementations fall back to a driver loop or a UDF with
  * state. Expressed instead as a left fold over the ordered trailing
  * frame (`aggregate` over a windowed `collect_list`), it stays inside
  * the engine: one range-partitioned sort per key column, bounded frame,
  * codegen'd arithmetic, and — because every engine folds a list
  * left-to-right the same way — bit-reproducible across engines, which
  * an `a^(i-j)` power formulation is not (it overflows `a^-j` for long
  * histories and reorders the float sum).
  */
object TimeSeries {

  /** Exponentially-weighted moving average of `valueCol` over the
    * trailing `lookback` rows per key, ordered by `orderCols`:
    * ewma_i = Σ_{d=0..lookback-1} α^d · x_{i-d}, evaluated as the exact
    * left fold s ← s·α + x from the oldest row in the frame (so the
    * newest row has weight 1, like pandas `ewm(adjust=True)` numerators).
    *
    * The trailing frame bounds both the collected list (lookback rows,
    * O(1) per row) and the effective history: beyond ~log(ε)/log(α)
    * rows the truncated tail is below float noise anyway, so `lookback`
    * is a numerical-precision knob, not an approximation apology.
    * Appends `colName` (default "ewma"). Scales as one sort per
    * partition key — no state, no sequential pass over a key's history.
    *
    * Null values are SKIPPED (collect_list drops them): a null row
    * contributes no observation but still ages the frame's older rows
    * out of the lookback window.
    */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           valueCol: String, alpha: Double, lookback: Int = 20,
           colName: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(lookback - 1).toLong, Window.currentRow)
    val frame = collect_list(col(valueCol)).over(w)
    df.withColumn(colName,
      aggregate(frame, lit(0.0), (s: Column, x: Column) => s * lit(alpha) + x))
  }

  /** One-sided CUSUM change detection per key: S_i = max(0, S_{i−1} +
    * (x_i − target − slack)), alarm when S_i > threshold — the standard
    * sequential drift detector (Page 1954) a pipeline runs per source /
    * per scorer to catch upward level shifts the global mean hides.
    *
    * The recurrence looks inherently sequential, but it has an exact
    * prefix-scan closed form: with y_i = x_i − target − slack and
    * cs_i = Σ_{j≤i} y_j,  S_i = cs_i − min(0, min_{j≤i} cs_j)
    * (induction: max(0, cs_i − M_{i−1}) = cs_i − min(cs_i, M_{i−1}),
    * and min(cs_i, M_{i−1}) is exactly M_i since M_{i−1} ≤ 0). Both
    * terms are plain window aggregates over the SAME ordered frame, so
    * one range-partitioned sort per key serves the whole detector — no
    * driver loop, no stateful UDF, parallelism = number of keys, and
    * the prefix sums fold left-to-right identically in any engine.
    *
    * Appends `cusum` (S_i, rounded 6) and boolean `alarm`. Ordering
    * must be total per key for determinism — pass tie-breaking
    * `orderCols` (e.g. ts, event_id).
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
            valueCol: String, target: Double, slack: Double,
            threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val y = col(valueCol).cast("double") - lit(target) - lit(slack)
    // two window columns over ONE frame spec — a single sort serves both
    // (windows cannot nest, so the prefix sum lands in a column first)
    val s = col("__cs") - least(lit(0.0), min(col("__cs")).over(w))
    df.withColumn("__cs", sum(y).over(w))
      .withColumn("cusum", round(s + lit(1e-12), 6))
      .withColumn("alarm", s > threshold)
      .drop("__cs")
  }
}
