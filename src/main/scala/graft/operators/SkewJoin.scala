package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions (north-star scale
  * technique; AQE's skew-join handles moderate skew at runtime, salting
  * handles the pathological hot-key case deterministically).
  *
  * The probe side's hot key would normally land one giant partition; we
  * append a salt in [0, salts) derived from a high-cardinality column
  * (deterministic — no RNG), and replicate the build side once per salt
  * value. Join on (key, salt) spreads the hot key over `salts` partitions.
  * The result set is row-identical to the unsalted join.
  */
object SkewJoin {

  def saltedInner(probe: DataFrame, build: DataFrame, probeKey: String,
                  buildKey: String, saltSource: Column, salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(saltedBuild,
        saltedProbe(probeKey) === saltedBuild(buildKey)
          && saltedProbe("__salt") === saltedBuild("__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation for hot grouping keys: partial
    * aggregate on (key, salt) — spreading each hot key over `salts`
    * partitions — then final aggregate on key. `aggs` must be
    * re-aggregatable (sum/count/min/max); results identical to the
    * direct groupBy.
    */
  def saltedAgg(df: DataFrame, key: String, saltSource: Column, salts: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
}
