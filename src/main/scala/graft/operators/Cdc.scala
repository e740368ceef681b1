package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply / upsert — merge a change stream (insert/update/delete
  * rows with a sequence number) into a base snapshot, latest change per
  * key winning. The batch equivalent of MERGE INTO for plain-parquet
  * pipelines: the next snapshot is (base minus touched keys) union the
  * surviving change payloads.
  *
  * Scale design: the latest-wins window and the anti-join both key on
  * the same column, so the change set is shuffled ONCE (the window's
  * hash partitioning satisfies the join's distribution on that side);
  * the base table is shuffled once for the anti-join — or not at all
  * when the day's change set is small enough for AQE to broadcast it,
  * the common case for incremental loads. Nothing is collected; the
  * union is a plan-level concat, not a materialization.
  */
object Cdc {

  /** Apply `changes` to `base`. `changes` must carry every `base`
    * column plus `seqCol` (ordering within a key; highest wins) and
    * `opCol` ('insert' | 'update' | 'delete' — insert and update are
    * both upserts once latest-wins has been applied).
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val missing = base.columns.toSet -- changes.columns.toSet
    require(missing.isEmpty, s"changes is missing base columns: $missing")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val upserts = latest.filter(col(opCol) =!= "delete")
      .select(base.columns.map(col).toIndexedSeq: _*)
    base.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }
}
