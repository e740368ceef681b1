package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operators from the reference inventory (SURVEY.md §2.6).
  *
  * Scale notes: every shape here is a hash aggregate with map-side partial
  * aggregation — the shuffle carries one row per (group, partition), not
  * per input row, so these hold at 100 TB as long as group cardinality
  * fits the cluster (it does: groups are dimension-sized).
  */
object Aggregates {

  /** Deterministic "first value per group". The reference uses bare
    * `first()` (etl.py:169-180,355-358) which is partition-order-dependent;
    * we pin the order with `min_by(value, orderCol)` so results are stable
    * and oracle-comparable (SURVEY.md §7.4).
    */
  def firstBy(value: Column, order: Column): Column = min_by(value, order)

  /** Group + one-row-per-group stats (ref: etl.py:169-180 — the
    * demographics "first of each per-city stat" aggregate).
    */
  def firstAgg(df: DataFrame, keys: Seq[String], order: Column,
               values: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(firstBy(col(values.head), order).as(values.head),
           values.tail.map(v => firstBy(col(v), order).as(v)): _*)

  /** Pivot with an EXPLICIT value list (ref: etl.py:183,
    * `groupBy(...).pivot("Race").sum("Count")`). Passing the values makes
    * the pivot single-pass (no distinct-scan job) and the output schema
    * deterministic — both required at scale (SURVEY.md §7.4).
    */
  def pivotAgg(df: DataFrame, keys: Seq[String], pivotCol: String,
               values: Seq[String], agg: Column): DataFrame =
    df.groupBy(keys.map(col): _*).pivot(pivotCol, values).agg(agg)

  /** Whole-row dedup (ref: etl.py:289,310 `dropDuplicates()`): an
    * aggregate over all columns — one shuffle on the full row hash.
    */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Row-count quality gate (ref: etl.py:127-143, `quality_checks`):
    * empty output is a pipeline error. An eager action.
    */
  def qualityCheck(df: DataFrame, name: String): Long = {
    val n = df.count()
    require(n > 0, s"Data quality check failed for $name: 0 records")
    n
  }
}
