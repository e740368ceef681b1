package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch form of the streaming session window;
  * north-star op, absent from the reference).
  *
  * Marks a new session whenever the gap to the previous event of the same
  * key exceeds `maxGap` (same units as `ts`), then assigns a running
  * per-key session index.
  *
  * Scale: one shuffle by key + partition-local sort; the two stacked
  * windows share the same partitioning/ordering so Catalyst plans a
  * single sort, no extra exchange.
  */
object Sessionize {

  /** Adds a `session_idx` column (1-based per key). `tie` breaks equal
    * timestamps deterministically.
    */
  def byGap(df: DataFrame, key: String, ts: String, tie: String, maxGap: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val gapFlag = when(
      lag(col(ts), 1).over(w).isNull ||
        (col(ts) - lag(col(ts), 1).over(w)) > maxGap, 1L).otherwise(0L)
    df.withColumn("__new_session", gapFlag)
      .withColumn("session_idx",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
