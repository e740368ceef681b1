package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: generate each key's full date spine and
  * forward-fill observations into the gaps — the standard prep step
  * before windowed feature extraction on irregular event data.
  *
  * Scale shape: the spine is `explode(sequence(min, max, step))` off a
  * per-key min/max aggregate — one narrow shuffle, spine rows are
  * generated distributed (never on the driver); the fill is one
  * `last(ignoreNulls)` window over the same per-key partitioning.
  */
object GapFill {

  /** Per-key spine of `step`-spaced values of `dateCol` covering each
    * key's [min, max] — emitted under the same column names so it joins
    * back onto the observations directly.
    */
  def spine(df: DataFrame, keyCol: String, dateCol: String, step: Column): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), step)).as(dateCol))

  /** Left-join observations onto the spine and forward-fill `fillCols`
    * (last non-null in `dateCol` order per key). Columns in `zeroCols`
    * are coalesced to 0 instead (counts/sums over gap periods).
    */
  def fillForward(observations: DataFrame, keyCol: String, dateCol: String,
                  step: Column, fillCols: Seq[String], zeroCols: Seq[String]): DataFrame = {
    val base = spine(observations, keyCol, dateCol, step)
      .join(observations, Seq(keyCol, dateCol), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = fillCols.foldLeft(base) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    zeroCols.foldLeft(filled) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L)))
    }
  }
}
