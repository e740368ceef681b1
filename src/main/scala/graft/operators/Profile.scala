package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiler — the "what is in this table" utility a
  * data pipeline runs before trusting a new drop: per column, row
  * count, null count, exact distinct count, and min/max rendered as
  * strings.
  *
  * Scale design: ONE aggregate over the table, not one scan per
  * column. The multiple count(distinct colX) aggregates are planned by
  * Spark through a single Expand (each row replicated once per
  * distinct-column) feeding one partial+final aggregate pair — so a
  * k-column profile costs one scan plus a k-times-expanded shuffle of
  * the distinct keys, with map-side partials shrinking each group to
  * its distinct values before the exchange. The per-column output rows
  * are then unpivoted from the single result row with `stack` (pure
  * projection, no extra pass).
  */
object Profile {

  /** Profile `cols` of `df`. `render` maps a column to its string form
    * for min/max (defaults to CAST AS STRING — pass an explicit
    * renderer for doubles, where engine float formatting differs).
    */
  def profile(df: DataFrame, cols: Seq[String],
              render: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val asStr = (name: String) => render.getOrElse(name, (c: Column) => c.cast("string"))
    val aggs: Seq[Column] = cols.flatMap { name =>
      val c = col(name)
      Seq(
        count(when(c.isNull, lit(1))).as(s"__null_$name"),
        countDistinct(c).as(s"__dist_$name"),
        asStr(name)(min(c)).as(s"__min_$name"),
        asStr(name)(max(c)).as(s"__max_$name"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map { name =>
      s"'$name', __rows, __null_$name, __dist_$name, __min_$name, __max_$name"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_null, n_distinct, min_str, max_str)")
  }
}
