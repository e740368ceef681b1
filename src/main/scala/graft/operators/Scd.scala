package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension style run collapse: given per-entity rows
  * ordered by an event/snapshot column, collapse CONSECUTIVE rows with an
  * unchanged attribute into one validity interval — the standard SCD-2
  * history builder over append-only snapshots/facts.
  *
  * Shape: one lag window flags attribute changes, a running sum over the
  * SAME window frame numbers the runs (Catalyst plans one exchange + one
  * sort for both), then a hash aggregate per (entity, run) emits the
  * interval. Two shuffles total, each narrow; no self-join, no
  * driver-side state — survives any number of entities and snapshots.
  */
object Scd {

  /** Returns (keyCol, attrCol, run_id, valid_from, valid_to, n_rows)
    * where valid_from/valid_to are the min/max of `orderCol` within the
    * run and run_id numbers an entity's runs from 1 in `orderCol` order.
    * `tieCol` breaks order ties deterministically.
    */
  def collapseRuns(df: DataFrame, keyCol: String, orderCol: String,
                   tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    val changed = when(
      lag(col(attrCol), 1).over(w).isNull ||
        lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L)
    df.withColumn("__chg", changed)
      .withColumn("run_id",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("run_id"), col(attrCol))
      .agg(min(col(orderCol)).as("valid_from"),
        max(col(orderCol)).as("valid_to"),
        count(lit(1)).as("n_rows"))
  }
}
