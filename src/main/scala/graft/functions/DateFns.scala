package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native Catalyst replacements for the reference's four Python date UDFs
  * (ref: etl.py:61-125). Pure `Column` compositions — stay inside
  * whole-stage codegen, never cross a UDF boundary, and remain
  * pushdown-friendly.
  */
object DateFns {

  private val SasEpoch: Column = to_date(lit("1960-01-01"))

  /** SAS epoch day-offset -> DateType. Null-safe: null in, null out.
    * 0 maps to 1960-01-01 (semantics of ref etl.py:61-74,
    * `convert_sas_udf`).
    */
  def sasDate(days: Column): Column = date_add(SasEpoch, days.cast("int"))

  /** SAS epoch day-offset -> "yyyy-MM-dd" string, exactly the string the
    * reference UDF produced (ref: etl.py:61-74).
    */
  def sasDateStr(days: Column): Column =
    date_format(sasDate(days), "yyyy-MM-dd")

  /** SAS epoch day-offset -> DateType with Python-falsy semantics: BOTH
    * null and 0 map to null (ref: etl.py:119-125, `get_date_udf` guards
    * with `if x:` so day 0 — 1960-01-01 itself — is dropped; contrast
    * with sasDate above).
    */
  def sasDateZeroNull(days: Column): Column =
    when(days.isNull || days === 0, lit(null).cast("date"))
      .otherwise(date_add(SasEpoch, days.cast("int")))

  /** Day count between two dates, `end - start` (ref: etl.py:76-90,
    * `date_diff_udf` computing `stay = depdate - arrdate`). Null-safe.
    */
  def stayDays(start: Column, end: Column): Column =
    datediff(end, start)

  /** Season bucket from a 1-12 month number (ref: etl.py:325-328, the SQL
    * CASE WHEN over `arrival_month`).
    */
  def seasonOf(month: Column): Column =
    when(month.isin(12, 1, 2), "winter")
      .when(month.isin(3, 4, 5), "spring")
      .when(month.isin(6, 7, 8), "summer")
      .otherwise("autumn")
}
