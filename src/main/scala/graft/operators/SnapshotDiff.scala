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
    def hashed(df: DataFrame, h: String) = df.select(col(keyCol),
      md5(concat_ws("",
        // concat_ws SKIPS null elements (so (null,"a") and ("a",null)
        // would collide) - encode null explicitly
        payloadCols.map(c => coalesce(col(c).cast("string"), lit("null"))): _*)).as(h))
    hashed(prev, "__hp").join(hashed(next, "__hn"), Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__hp").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__hp") =!= col("__hn"), "changed"))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"))
  }
}
