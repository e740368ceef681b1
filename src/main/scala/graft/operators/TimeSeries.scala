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
}
