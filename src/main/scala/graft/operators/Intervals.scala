package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra per key — merging overlapping/touching spans into
  * their union (detection spans, speech segments, validity windows).
  * The gap-sessionization cousin for data that arrives as ranges
  * instead of points.
  *
  * Shape: one window partitioning per key ordered by start; a span
  * starts a NEW merged group when its start exceeds the running maximum
  * end of everything before it (the classic sweep), then group bounds
  * aggregate per (key, group). Both the windows and the aggregate share
  * the same key clustering, so the whole operator is ONE exchange + one
  * partition-local sort at any scale.
  */
object Intervals {

  /** Merge overlapping or touching [startCol, endCol] spans per key.
    * Output: key, merge_id (1-based per key), span start/end, n_merged.
    */
  def mergeOverlaps(df: DataFrame, keyCol: String,
                    startCol: String, endCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    // running max end over PRECEDING rows only; first row has none
    val prevMaxEnd = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val newGroup = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    df.withColumn("__new", newGroup)
      .withColumn("merge_id", sum(col("__new")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("merge_id"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
  }
}
