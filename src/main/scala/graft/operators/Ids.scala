package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared id/key preconditions. Operators that normalize an id with
  * `cast("long")` MUST gate the input type first: a non-integral column
  * would cast to null, null out the join/pair predicate, and silently
  * drop rows — the failure mode is invisible at small scale and a
  * recall hole at 100 TB. Fail loudly at plan-build time instead.
  */
object Ids {

  def requireIntegral(df: DataFrame, colName: String, role: String = "id"): Unit = {
    val dt = df.schema(colName).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$colName must be an integral $role column (got $dt): casting to long " +
        "would turn non-numeric values into null and silently drop rows")
  }
}
