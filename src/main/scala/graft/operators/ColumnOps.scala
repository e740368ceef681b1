package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / column-level operators from the reference inventory
  * (SURVEY.md §2.3-2.4). All are lazy plan transforms — pure Project /
  * coalesce nodes that Catalyst folds and pushes down.
  */
object ColumnOps {

  /** Cast each named column in place, skipping absent ones (ref:
    * etl.py:33-46, `cast_type`).
    */
  def castColumns(df: DataFrame, casts: Seq[(String, String)]): DataFrame =
    casts.foldLeft(df) { case (d, (name, tpe)) =>
      if (d.columns.contains(name)) d.withColumn(name, col(name).cast(tpe)) else d
    }

  /** Bulk rename (ref: etl.py:186-197,356-358 — 14 `withColumnRenamed`
    * chains). Single Project instead of 14 stacked ones.
    */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(renames.getOrElse(c, c))).toSeq: _*)

  /** Conditional value rewrite: where `field == from`, substitute `to`
    * (ref: etl.py:92-103, `change_field_value_condition`, used for the
    * country-name fix-ups at etl.py:367,384).
    */
  def conditionalReplace(df: DataFrame, field: String, fixes: Seq[(String, String)]): DataFrame = {
    val patched = fixes.foldLeft(col(field)) { case (c, (from, to)) =>
      when(col(field) === from, to).otherwise(c)
    }
    df.withColumn(field, patched)
  }

  /** Null -> 0 on a subset of numeric columns (ref: etl.py:199-215,
    * `fillna` over 12 demographic columns).
    */
  def fillZeros(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.fill(0, cols)

  /** Null-coalescing patch after a left join: where `target` is null, use
    * `fallback` (ref: etl.py:389-391 — `when(isnull(Country),
    * capitalize_udf(...)).otherwise(Country)`).
    */
  def coalescePatch(df: DataFrame, target: String, fallback: Column): DataFrame =
    df.withColumn(target, coalesce(col(target), fallback))
}
