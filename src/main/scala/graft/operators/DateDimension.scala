package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DateFns

/** The reference's arrival-date dimension build (ref: etl.py:276-336,
  * branch B): date -> calendar parts + season, deduplicated.
  *
  * One narrow Project then a single dedup shuffle over the (tiny) distinct
  * date domain — at 100 TB the partial aggregate collapses each input
  * partition to ≤ |distinct dates| rows before the exchange.
  */
object DateDimension {

  /** Expand a DateType column into the 7-column dimension. */
  def build(df: DataFrame, dateCol: Column): DataFrame =
    df.select(dateCol.as("arrival_iso_date"))
      .dropDuplicates()
      .select(
        col("arrival_iso_date"),
        year(col("arrival_iso_date")).as("arrival_year"),
        month(col("arrival_iso_date")).as("arrival_month"),
        dayofmonth(col("arrival_iso_date")).as("arrival_day"),
        dayofweek(col("arrival_iso_date")).as("day_of_week"),
        weekofyear(col("arrival_iso_date")).as("arrival_weekofyear"))
      .withColumn("date_season", DateFns.seasonOf(col("arrival_month")))
}
