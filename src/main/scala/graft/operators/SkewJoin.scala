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

  /** Hot-key split driven by a DataFrame instead of a driver collect:
    * `hotKeys` is a ONE-COLUMN DataFrame of hot key values (broadcast-
    * sized by the definition of skew — a hot-key set that isn't tiny is
    * volume, not skew). Cold keys take the plain equi-join; hot keys the
    * salted leg, with the build side replicated `salts`× ONLY for the
    * hot keys' rows. The union is row-identical to
    * `probe.join(build, Seq(key))`.
    *
    * Versus [[saltedInnerHotOnly]]: no job runs at plan-build time — the
    * hot list stays a lazy plan until Spark broadcasts it, so the caller
    * can derive it from an aggregate the query already computes (e.g.
    * the build side's own counts) instead of paying a separate
    * detection pass, and the key type is unconstrained (string grams,
    * not just longs). Both key columns must already share `key` as
    * their name (USING-join semantics keep one copy).
    *
    * One cheap eager action runs at plan-build time: `hotKeys.isEmpty`.
    * When NOTHING is hot (the common case on unskewed data) the split
    * itself is the waste — the anti + semi legs read the probe twice
    * for no benefit, two extra corpus passes at 100 TB — so the method
    * degrades to the plain single-pass join. The probe is hot-list-
    * sized by contract (derived from build-side counts), so the check
    * costs a model-table-sized job, mirroring [[saltedInnerHotOnly]]'s
    * eager detection precedent.
    */
  def saltedInnerHotDf(probe: DataFrame, build: DataFrame, key: String,
                       hotKeys: DataFrame, saltSource: Column,
                       salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    if (hotKeys.isEmpty) return probe.join(build, Seq(key))
    val hk = broadcast(hotKeys.toDF(key))
    val cold = probe.join(hk, Seq(key), "left_anti")
      .join(build.join(hk, Seq(key), "left_anti"), Seq(key))
    val saltedProbe = probe.join(hk, Seq(key), "left_semi")
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val saltedBuild = build.join(hk, Seq(key), "left_semi")
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    cold.unionByName(
      saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt"))
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
