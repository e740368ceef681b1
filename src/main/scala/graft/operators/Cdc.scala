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
    // Deterministic latest-wins: ties on seqCol are broken by a stable
    // hash of the full change row, so reruns and repartitions pick the
    // same winner (row_number over a tied sort is otherwise
    // partitioning-dependent).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc,
        xxhash64(changes.columns.map(col).toIndexedSeq: _*).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // A null/unknown op must fail loudly, not act as a silent delete:
    // the winning row's op is validated inline, so an unrecognized value
    // raises during evaluation instead of vanishing from the upsert set
    // while its key still anti-joins the base row away.
    val opChecked = when(col(opCol).isin("insert", "update", "delete"), col(opCol))
      .otherwise(raise_error(concat(lit("Cdc.applyChanges: unknown op '"),
        coalesce(col(opCol).cast("string"), lit("NULL")), lit("'"))))
    val upserts = latest.filter(opChecked =!= "delete")
      .select(base.columns.map(col).toIndexedSeq: _*)
    base.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }
}
