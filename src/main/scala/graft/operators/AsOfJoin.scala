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

  /** Fact×fact as-of: same result as [[leftAsOf]], but the heavy
    * union+window runs partitioned by `(by, ts div bucket)` instead of
    * `by` alone — parallelism scales with time-buckets, not with key
    * cardinality, so two huge sides with few hot keys no longer serialize
    * each key's full history into one task (the [[RangeJoin]]
    * bounded-replication idea applied to as-of).
    *
    * Exactness: for a left row in bucket b, the as-of match is either the
    * latest right row ≤ it INSIDE bucket b (the bucket-partitioned
    * [[leftAsOf]] finds it) or, if none, the last right row of some
    * earlier bucket. That carry is computed on the per-(key, bucket)
    * summary — one row per (key, bucket), so the key-partitioned carry
    * window is over bucket counts, not row counts — and stitched in with
    * a `(by, bucket)` equi-join. Any monotone bucketing of `ts` works;
    * integral `div` keeps epoch-nano precision that a double `floor`
    * would lose.
    *
    * Requires `rightPayload` to contain `ts` (the matched timestamp is
    * the no-match-within-bucket sentinel) and non-null `ts` on both
    * sides.
    */
  def leftAsOfBucketed(left: DataFrame, right: DataFrame, by: Seq[String],
                       ts: String, tie: String, rightPayload: Seq[String],
                       bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    require(rightPayload.contains(ts),
      s"leftAsOfBucketed needs the matched right-side timestamp as the " +
        s"within-bucket-miss sentinel: include '$ts' in rightPayload " +
        s"(got ${rightPayload.mkString("[", ", ", "]")})")
    val lb = left.withColumn("__bkt", expr(s"$ts div $bucket"))
    val rb = right.withColumn("__bkt", expr(s"$ts div $bucket"))
    val payloadAliases = rightPayload.map(p => s"asof_$p")
    val carryAliases   = rightPayload.map(p => s"__carry_$p")

    // exact as-of restricted to each (key, bucket) — the hot path, now
    // partitioned fine enough that no single key pins a task
    val within = leftAsOf(lb, rb, by :+ "__bkt", ts, tie, rightPayload)

    // one summary row per (key, bucket): the bucket's last right row
    val rWin = Window.partitionBy((by :+ "__bkt").map(col): _*)
      .orderBy(col(ts).desc, col(tie).desc)
    val lastPerBucket = rb
      .withColumn("__rn", row_number().over(rWin)).filter(col("__rn") === 1)
      .select(by.map(col) ++ Seq(col("__bkt"), lit(1).as("__side"))
        ++ rightPayload.zip(carryAliases).map { case (p, a) => col(p).as(a) }: _*)
    // left bucket markers sort BEFORE same-bucket right summaries
    // (side 0 < 1), so the running last sees strictly-earlier buckets only
    val rightTypes = right.select(rightPayload.map(col): _*).schema.fields
    val leftMarkers = lb.select(by.map(col) :+ col("__bkt"): _*).distinct()
      .select(by.map(col) ++ Seq(col("__bkt"), lit(0).as("__side"))
        ++ rightTypes.zip(carryAliases).map { case (f, a) => lit(null).cast(f.dataType).as(a) }: _*)
    val cw = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__bkt"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = carryAliases
      .foldLeft(lastPerBucket.unionByName(leftMarkers)) { (df, a) =>
        df.withColumn(a, last(col(a), ignoreNulls = true).over(cw))
      }
      .filter(col("__side") === 0)
      .drop("__side")

    // capture the miss flag BEFORE any payload substitution — asof_<ts>
    // is itself a payload column, and rewriting it first would flip the
    // gate for the remaining columns (same trap as leftAsOfTolerance)
    val joined = within.join(carry, by :+ "__bkt", "left")
      .withColumn("__miss", col(s"asof_$ts").isNull)
    payloadAliases.zip(carryAliases)
      .foldLeft(joined) { case (df, (a, c)) =>
        df.withColumn(a, when(col("__miss"), col(c)).otherwise(col(a)))
      }
      .drop(carryAliases: _*)
      .drop("__miss")
      .drop("__bkt")
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
