package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff of two table snapshots — the audit a pipeline runs before
  * promoting a new corpus version: which rows were added, removed, or
  * changed, without eyeballing 100 TB.
  *
  * Payload comparison hashes the named columns into one 128-bit md5 per
  * side, so the full-outer join carries (key, hash) — never payloads —
  * and change detection is a single equality. Unchanged rows are dropped
  * by default (at scale they are ~all rows; the diff output is
  * churn-sized).
  */
object SnapshotDiff {

  /** Diff `next` against `prev` on `keyCol`, comparing `payloadCols`.
    * Output: key, status ('added' | 'removed' | 'changed').
    */
  def diff(prev: DataFrame, next: DataFrame, keyCol: String,
           payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "diff needs at least one payload column")
    // Each field is encoded as "N" (null) or "<charlen>:<value>" before
    // concatenation. The length prefix makes the encoding a prefix code:
    // the concatenation parses back unambiguously left-to-right, so no
    // data content (including separator characters) can shift a column
    // boundary into a collision, and null can never collide with any
    // literal value. Stays inside codegen (to_json is CodegenFallback).
    def hashed(df: DataFrame, h: String) = df.select(col(keyCol),
      md5(concat_ws("",
        payloadCols.map { c =>
          val s = col(c).cast("string")
          when(s.isNull, lit("N"))
            .otherwise(concat(length(s).cast("string"), lit(":"), s))
        }: _*)).as(h))
    hashed(prev, "__hp").join(hashed(next, "__hn"), Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__hp").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__hp") =!= col("__hn"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }
}
