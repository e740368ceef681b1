package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered inner join — the explicit form of Spark's own
  * runtime row-level filtering (`InjectRuntimeFilter`, which only fires
  * above size thresholds and under AQE heuristics).
  *
  * Build a bloom filter over the small side's join key (one distributed
  * TypedImperativeAggregate — partials merge map-side, the driver
  * receives ONE row holding the serialized sketch, the same class of
  * driver traffic as a broadcast build side), embed it as a binary
  * Literal in a `might_contain` predicate, and filter the large side
  * BEFORE its join shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling roughly its matching
  * fraction; false positives (3% at the default sizing) only cost extra
  * shuffled rows, never correctness — the subsequent join re-checks the
  * key exactly, so the result is row-identical to the plain join.
  *
  * Both sides hash `cast(key as long)` so the XxHash64 input types (and
  * therefore hash values) agree regardless of the columns' parquet
  * physical types.
  */
object BloomJoin {

  def bloomFilteredInner(large: DataFrame, small: DataFrame,
                         largeKey: String, smallKey: String,
                         expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.types.BinaryType

    val hashedSmall = new XxHash64(Seq(bridge.toExpression(col(smallKey).cast("long"))))
    val bloomCol = bridge.toColumn(
      new BloomFilterAggregate(hashedSmall, expectedItems).toAggregateExpression())
    val bytes = small.groupBy().agg(bloomCol.as("__bf")).head().getAs[Array[Byte]](0)

    val filtered =
      if (bytes == null) large.filter(lit(false)) // empty build side: inner join is empty
      else large.filter(bridge.toColumn(BloomFilterMightContain(
        Literal.create(bytes, BinaryType),
        new XxHash64(Seq(bridge.toExpression(col(largeKey).cast("long")))))))
    filtered.join(small, filtered(largeKey) === small(smallKey))
  }
}
