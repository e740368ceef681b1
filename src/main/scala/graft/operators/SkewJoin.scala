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

  /** Detect heavy keys: one count aggregate, keep keys above `threshold`
    * occurrences, collect ONLY those (the hot-key list is tiny by
    * definition — a key set that isn't tiny isn't skew, it's volume).
    */
  def heavyKeys(df: DataFrame, key: String, threshold: Long): Seq[Long] =
    df.groupBy(col(key).cast("long").as("__k"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= threshold)
      .collect().map(_.getLong(0)).toSeq

  /** Hot-key-only salted join: blanket salting replicates the ENTIRE
    * build side `salts` times — wasted shuffle volume when only a few
    * keys are actually hot. Here the probe side splits on the detected
    * hot-key list (an isin over a driver-collected handful): cold keys
    * take the plain join, hot keys the salted path with a build side
    * replicated ONLY for the hot keys' rows. Union of the two legs is
    * row-identical to the plain join — the textbook partial-salting
    * shape for 100 TB facts with a handful of pathological keys.
    */
  def saltedInnerHotOnly(probe: DataFrame, build: DataFrame, probeKey: String,
                         buildKey: String, saltSource: Column, salts: Int,
                         hotThreshold: Long): DataFrame = {
    val hot = heavyKeys(probe, probeKey, hotThreshold)
    if (hot.isEmpty) probe.join(build, probe(probeKey) === build(buildKey))
    else {
      val cold = probe.filter(!col(probeKey).isin(hot: _*))
        .join(build, probe(probeKey) === build(buildKey))
      val hotJoin = saltedInner(
        probe.filter(col(probeKey).isin(hot: _*)),
        build.filter(col(buildKey).isin(hot: _*)),
        probeKey, buildKey, saltSource, salts)
      cold.unionByName(hotJoin)
    }
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
