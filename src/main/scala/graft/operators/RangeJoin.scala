package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: `left.key == right.key AND right.ts in
  * [left.ts - before, left.ts + after]`.
  *
  * A naive theta-join on the inequality becomes a per-key cross product
  * (broadcast nested loop at scale). Instead both sides are bucketed by
  * `ts div width` with `width >= before + after`: every qualifying pair
  * then lands within one bucket of each other, so replicating the right
  * side into its bucket +/- 1 and equi-joining on (key, bucket) bounds
  * the blowup at 3x right-side rows while staying a hash join. The exact
  * range predicate filters the candidates.
  */
object RangeJoin {

  def innerRange(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 before: Long, after: Long): DataFrame = {
    val width = math.max(before + after, 1L)
    val lb = left.withColumn("__b", expr(s"$leftTs div ${width}L"))
    val rb = right
      .withColumn("__rb", expr(s"$rightTs div ${width}L"))
      .withColumn("__b", explode(array(col("__rb") - 1, col("__rb"), col("__rb") + 1)))
      .drop("__rb")
    lb.join(rb, lb(key) === rb(key) && lb("__b") === rb("__b")
        && rb(rightTs) >= lb(leftTs) - before
        && rb(rightTs) <= lb(leftTs) + after)
      .drop(rb(key)).drop(lb("__b")).drop(rb("__b"))
  }
}
