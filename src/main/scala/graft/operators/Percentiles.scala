package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles from a distinct-value histogram — the
  * scale-safe replacement for the buffer-all `percentile` aggregate.
  *
  * Spark's exact `percentile` collects every (value -> count) of a group
  * into ONE in-memory aggregation buffer and sorts it in the final stage:
  * memory is O(group distinct values) in a single task and parallelism is
  * bounded by the number of groups (3 tasks for a 3-group corpus). At
  * 100 TB that final stage is the whole job, and a heavy group OOMs it.
  *
  * This operator computes the identical result as a dataflow:
  *
  *   1. histogram: groupBy(group, value) -> count. Parallel everywhere,
  *      shrinks rows to distinct values, map-side partial aggregation.
  *   2. range-shard the histogram by (group, value) — contiguous value
  *      ranges per shard (`repartitionByRange`, materialized once so
  *      every consumer sees ONE boundary assignment; see the
  *      localCheckpoint note below).
  *   3. two-level cumulative count: a window cumsum WITHIN each
  *      (group, shard) — parallelism = groups x shards, spillable — plus
  *      a broadcast join of per-shard offsets (a groups x shards -row
  *      aggregate, cumsum'd over shard ids).
  *   4. the rows covering rank floor(p*(n-1)) / ceil(p*(n-1)) are
  *      selected by `cum - cnt <= rank < cum` and interpolated with
  *      Spark's own formula, so results are bit-identical to
  *      `percentile(col, p)` (interpolation special cases included).
  *
  * No stage buffers more than a shard of distinct values; no stage's
  * parallelism is bounded by the group count alone.
  */
object Percentiles {

  /** (groupCols..., `__v` double, `__cnt` long) distinct-value histogram;
    * nulls dropped (matching the `percentile` aggregate's null handling).
    */
  def histogram(df: DataFrame, groupCols: Seq[String], valCol: String): DataFrame =
    df.select(groupCols.map(col) :+ col(valCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))

  /** Exact percentiles `ps` of `valCol` per group: one row per group with
    * an `out` array<double> column ordered like `ps` — the histogram form
    * of `groupBy(group).agg(percentile(valCol, array(ps)))`. Groups whose
    * values are all null vanish (the aggregate form would emit null).
    */
  def exact(df: DataFrame, groupCols: Seq[String], valCol: String,
            ps: Seq[Double], out: String = "percentiles",
            shards: Int = 0): DataFrame =
    fromHistogram(histogram(df, groupCols, valCol), groupCols, "__v", "__cnt",
      ps, out, shards)

  /** Weighted exact percentiles: each row's value counts `weightCol`
    * times — identical semantics (interpolation included) to the builtin
    * `percentile(valCol, ps, weightCol)` frequency form, but through the
    * histogram dataflow, so neither memory nor parallelism degrades with
    * group size. Rows with null value or non-positive weight are dropped
    * (the builtin errors on negative frequency; a streaming-friendly
    * gate beats a data-dependent throw at scale).
    */
  def weightedExact(df: DataFrame, groupCols: Seq[String], valCol: String,
                    weightCol: String, ps: Seq[Double],
                    out: String = "percentiles", shards: Int = 0): DataFrame = {
    val hist = df.select(groupCols.map(col)
        :+ col(valCol).cast("double").as("__v")
        :+ col(weightCol).cast("long").as("__w"): _*)
      .filter(col("__v").isNotNull && col("__w") > 0)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(sum(col("__w")).as("__cnt"))
    fromHistogram(hist, groupCols, "__v", "__cnt", ps, out, shards)
  }

  /** Percentiles from a pre-aggregated (value, weight) histogram — the
    * multiset {valCol repeated cntCol times} per group. Exposed so
    * derived histograms (e.g. |value - median| deviations for MAD) can be
    * re-aggregated at distinct-value cost instead of rescanning the
    * corpus. `hist` must have at most one row per (group, value); value
    * must be double-typed and non-null; counts positive.
    */
  def fromHistogram(hist: DataFrame, groupCols: Seq[String], valCol: String,
                    cntCol: String, ps: Seq[Double], out: String = "percentiles",
                    shards: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must be in [0, 1]")
    val nShards =
      if (shards > 0) shards
      else hist.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val gcols = groupCols.map(col)
    val cnt = col(cntCol).cast("long")

    // Order-preserving shards: contiguous (group, value) ranges. The shard
    // id must be captured BEFORE the window's hash exchange moves rows,
    // and the localCheckpoint is LOAD-BEARING: the level-1 and level-2
    // branches below each read `ranged`, and without materialization
    // each re-instantiates the range exchange — RangePartitioner SAMPLES
    // its boundaries with a per-instantiation seed, so the two branches
    // can assign the same row to different shards and the stitched
    // cumulative counts silently corrupt (caught by a RankedStats cumsum
    // diff; the exchanges do NOT get ReusedExchange'd because each
    // branch prunes different columns). Materializing the histogram
    // (distinct values, not corpus rows) stays bounded at any SF.
    val ranged = hist
      .repartitionByRange(nShards, gcols :+ col(valCol): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()

    // Level 1: cumulative count within (group, shard), ordered by value.
    // Explicit partition count on the window's exchange — AQE byte-based
    // coalescing otherwise merges a byte-small histogram's shards into
    // one partition and serializes the cumsum (see RankedStats).
    val wLoc = Window.partitionBy(gcols :+ col("__pid"): _*).orderBy(col(valCol))
    val local = ranged.repartition(nShards, gcols :+ col("__pid"): _*)
      .withColumn("__lcum", sum(cnt).over(wLoc))

    // Level 2: shard totals -> exclusive offsets + group totals. Tiny
    // (groups x shards rows); shares `ranged`'s exchange with level 1.
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(gcols :+ col("__pid"): _*)
      .agg(sum(cnt).as("__stot"))
      .select(gcols ++ Seq(col("__pid"),
        coalesce(sum(col("__stot")).over(wOff), lit(0L)).as("__off"),
        sum(col("__stot")).over(Window.partitionBy(gcols: _*)).as("__n")): _*)

    val cum = local.join(broadcast(offsets), groupCols :+ "__pid")
      .withColumn("__cum", col("__lcum") + col("__off"))

    // Per requested percentile p: 0-indexed position p*(n-1); the rows
    // whose cumulative range covers floor/ceil of it carry the two keys.
    val n1 = (col("__n") - 1).cast("double")
    val aggs = max(col("__n")).as("__nn") +: ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * n1
      val loRank = floor(pos).cast("long")
      val hiRank = ceil(pos).cast("long")
      val from = col("__cum") - col(cntCol)
      Seq(
        max(when(from <= loRank && loRank < col("__cum"), col(valCol))).as(s"__vl$i"),
        max(when(from <= hiRank && hiRank < col("__cum"), col(valCol))).as(s"__vu$i"))
    }
    val agged = cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)

    // Spark Percentile.getPercentile interpolation, special cases and
    // operation order included: integral position or equal keys -> lower
    // key; else (higher - pos) * lower + (pos - lower) * higher.
    val vals = ps.zipWithIndex.map { case (p, i) =>
      val pos = lit(p) * (col("__nn") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      val vl = col(s"__vl$i")
      val vu = col(s"__vu$i")
      when(lo === hi || vl === vu, vl)
        .otherwise((hi - pos) * vl + (pos - lo) * vu)
    }
    agged.select(gcols :+ array(vals: _*).as(out): _*)
  }
}
