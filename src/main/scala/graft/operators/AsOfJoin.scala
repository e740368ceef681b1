package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator the reference lacks entirely; built by
  * composing Spark primitives (SURVEY.md §7.5 north-star).
  *
  * For each left row, attaches the payload of the LATEST right row with
  * `right.ts <= left.ts` in the same `by` group (inclusive, matching
  * DuckDB/QuestDB ASOF semantics).
  *
  * Implementation is the union + running-`last(ignoreNulls)` pattern:
  * tag both sides, union, sort each `by`-partition by (ts, side, tie),
  * carry right payloads forward with an unbounded-preceding window, keep
  * left rows. Right rows sort BEFORE left rows at equal ts, which is what
  * makes the match inclusive.
  *
  * Scale: exactly one shuffle of each side (hash by `by`), then a
  * partition-local sort — the same cost as a sort-merge join, with no
  * range-explosion or per-row probe. Hot keys can be salted upstream if a
  * single `by` group outgrows a partition.
  *
  * Requires: both frames contain `by`, `ts`, `tie` columns under the same
  * names; `(ts, tie)` unique per side within a group for full determinism.
  */
object AsOfJoin {

  /** leftAsOf with a maximum lookback: matches older than `tolerance`
    * (same units as `ts`) are nulled out — composition keeps the join
    * single-pass, the tolerance is a post-projection.
    */
  def leftAsOfTolerance(left: DataFrame, right: DataFrame, by: Seq[String],
                        ts: String, tie: String, rightPayload: Seq[String],
                        tolerance: Long): DataFrame = {
    require(rightPayload.contains(ts),
      s"leftAsOfTolerance needs the matched right-side timestamp to judge staleness: " +
        s"include '$ts' in rightPayload (got ${rightPayload.mkString("[", ", ", "]")})")
    // capture staleness BEFORE nulling any payload column — asof_<ts> may
    // itself be in the payload, and nulling it first would make the
    // predicate NULL for the remaining columns
    val joined = leftAsOf(left, right, by, ts, tie, rightPayload)
      .withColumn("__stale", col(s"asof_$ts") < (col(ts) - tolerance))
    rightPayload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"asof_$p",
        when(col("__stale"), lit(null).cast(df.schema(s"asof_$p").dataType))
          .otherwise(col(s"asof_$p")))
    }.drop("__stale")
  }

  def leftAsOf(left: DataFrame, right: DataFrame, by: Seq[String],
               ts: String, tie: String, rightPayload: Seq[String]): DataFrame = {
    val rightTypes = right.select(rightPayload.map(col): _*).schema.fields
    val payloadAliases = rightPayload.map(p => s"asof_$p")

    val leftTagged = left.select(
      (by.map(col) ++ Seq(col(ts), col(tie), lit(1).as("__is_left"))
        ++ left.columns.filterNot((by :+ ts :+ tie).contains).map(col)
        ++ rightTypes.zip(payloadAliases).map { case (f, a) => lit(null).cast(f.dataType).as(a) }): _*)

    val rightTagged = right.select(
      (by.map(col) ++ Seq(col(ts), col(tie), lit(0).as("__is_left"))
        ++ left.columns.filterNot((by :+ ts :+ tie).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ rightPayload.zip(payloadAliases).map { case (p, a) => col(p).as(a) }): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(ts), col("__is_left"), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    payloadAliases
      .foldLeft(leftTagged.unionByName(rightTagged)) { (df, a) =>
        df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
      }
      .filter(col("__is_left") === 1)
      .drop("__is_left")
  }
}
