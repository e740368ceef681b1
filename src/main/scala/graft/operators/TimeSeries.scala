package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered per-key time-series features.
  *
  * The recurrence s' = s·α + x is inherently sequential, which is why
  * naive EWMA implementations fall back to a driver loop or a UDF with
  * state. Expressed instead as a left fold over the ordered trailing
  * frame (`aggregate` over a windowed `collect_list`), it stays inside
  * the engine: one range-partitioned sort per key column, bounded frame,
  * codegen'd arithmetic, and — because every engine folds a list
  * left-to-right the same way — bit-reproducible across engines, which
  * an `a^(i-j)` power formulation is not (it overflows `a^-j` for long
  * histories and reorders the float sum).
  */
object TimeSeries {

  /** Exponentially-weighted moving average of `valueCol` over the
    * trailing `lookback` rows per key, ordered by `orderCols`:
    * ewma_i = Σ_{d=0..lookback-1} α^d · x_{i-d}, evaluated as the exact
    * left fold s ← s·α + x from the oldest row in the frame (so the
    * newest row has weight 1, like pandas `ewm(adjust=True)` numerators).
    *
    * The trailing frame bounds both the collected list (lookback rows,
    * O(1) per row) and the effective history: beyond ~log(ε)/log(α)
    * rows the truncated tail is below float noise anyway, so `lookback`
    * is a numerical-precision knob, not an approximation apology.
    * Appends `colName` (default "ewma"). Scales as one sort per
    * partition key — no state, no sequential pass over a key's history.
    *
    * Null values are SKIPPED (collect_list drops them): a null row
    * contributes no observation but still ages the frame's older rows
    * out of the lookback window.
    */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           valueCol: String, alpha: Double, lookback: Int = 20,
           colName: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(lookback - 1).toLong, Window.currentRow)
    val frame = collect_list(col(valueCol)).over(w)
    df.withColumn(colName,
      aggregate(frame, lit(0.0), (s: Column, x: Column) => s * lit(alpha) + x))
  }

  /** One-sided CUSUM change detection per key: S_i = max(0, S_{i−1} +
    * (x_i − target − slack)), alarm when S_i > threshold — the standard
    * sequential drift detector (Page 1954) a pipeline runs per source /
    * per scorer to catch upward level shifts the global mean hides.
    *
    * The recurrence looks inherently sequential, but it has an exact
    * prefix-scan closed form: with y_i = x_i − target − slack and
    * cs_i = Σ_{j≤i} y_j,  S_i = cs_i − min(0, min_{j≤i} cs_j)
    * (induction: max(0, cs_i − M_{i−1}) = cs_i − min(cs_i, M_{i−1}),
    * and min(cs_i, M_{i−1}) is exactly M_i since M_{i−1} ≤ 0). Both
    * terms are plain window aggregates over the SAME ordered frame, so
    * one range-partitioned sort per key serves the whole detector — no
    * driver loop, no stateful UDF, parallelism = number of keys, and
    * the prefix sums fold left-to-right identically in any engine.
    *
    * Appends `cusum` (S_i, rounded 6) and boolean `alarm`. Ordering
    * must be total per key for determinism — pass tie-breaking
    * `orderCols` (e.g. ts, event_id).
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
            valueCol: String, target: Double, slack: Double,
            threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val y = col(valueCol).cast("double") - lit(target) - lit(slack)
    // two window columns over ONE frame spec — a single sort serves both
    // (windows cannot nest, so the prefix sum lands in a column first)
    val s = col("__cs") - least(lit(0.0), min(col("__cs")).over(w))
    df.withColumn("__cs", sum(y).over(w))
      .withColumn("cusum", round(s + lit(1e-12), 6))
      .withColumn("alarm", s > threshold)
      .drop("__cs")
  }

  /** Autocorrelation function of the event-count series at lags
    * 1..`maxLag`: bucket timestamps into `bucketWidth`-wide bins,
    * densify over the full [min, max] bucket range (absent buckets
    * count 0 — ACF over a sparse series would silently splice gaps
    * together), then r(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² with the
    * numerator summed over the T−k overlapping pairs.
    *
    * Exactness: counts are integers, so every aggregate is an exact
    * long sum — Σx_a·x_b, Σx_a, Σx_b per lag plus global (T, S, Q) —
    * and the float arithmetic is a HANDFUL of operations on those
    * exact moments (num = Σxy − m·Σx_a − m·Σx_b + c·m², denom =
    * Q − S²/T), making the result partitioning-independent, unlike a
    * naive Σ(x−m)(y−m) float sum whose order varies per run.
    *
    * Scale shape: ONE map-side-combined corpus groupBy produces the
    * bucket counts; everything after is series-sized (time-range /
    * bucketWidth rows, independent of corpus size). The series is
    * localCheckpoint'd once — it feeds the stats row and both sides of
    * the lag join, and each reuse would otherwise rescan the corpus.
    * The only driver-side step collects exactly 2 longs (the bucket
    * bounds) to drive `spark.range`, which generates the dense grid in
    * parallel instead of exploding one giant array.
    *
    * Output: `lag`, `n_pairs` (= T−k on a dense grid), `acf` (rounded
    * 6; null when the series is constant, denom = 0). Empty input →
    * empty output.
    */
  /** Cross-correlation between two event-count series at lags
    * −`maxLag`..`maxLag`: bucket rows into `bucketWidth` bins, count
    * rows matching `aFilter` (series x) and `bFilter` (series y) per
    * bin, densify over the union [min, max] range, then
    * r(k) = Σ(x_t−x̄)(y_{t+k}−ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²) — the lead-lag
    * probe ("do clicks lead purchases by k hours?"). Positive k means
    * y LAGS x by k buckets.
    *
    * Same exactness design as [[acf]]: both series are integer counts,
    * so per-lag Σx·y, Σx, Σy and the global (T, Sx, Qx, Sy, Qy) are
    * exact long sums; floats touch only the final handful of
    * operations (num = Σxy − ȳ·Σx − x̄·Σy + c·x̄·ȳ), making the result
    * partitioning-independent. One corpus groupBy; everything after is
    * series-sized. Output: `lag`, `n_pairs`, `ccf` (rounded 6; null
    * when either series is constant). Empty input → empty output.
    */
  def ccf(df: DataFrame, tsCol: String, aFilter: Column, bFilter: Column,
          bucketWidth: Long, maxLag: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val spark = df.sparkSession
    val counts = df.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"$tsCol div $bucketWidth").as("h"))
      .agg(sum(when(aFilter, 1L).otherwise(0L)).as("x"),
        sum(when(bFilter, 1L).otherwise(0L)).as("y"))
    val bounds = counts.agg(min(col("h")), max(col("h"))).head
    if (bounds.isNullAt(0))
      return spark.range(0).select(col("id").as("lag"),
        col("id").as("n_pairs"), lit(null).cast("double").as("ccf"))
    val series = spark.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .toDF("h")
      .join(counts, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint()
    val stats = series.agg(count(lit(1)).as("__T"),
      sum(col("x")).as("__Sx"), sum(col("x") * col("x")).as("__Qx"),
      sum(col("y")).as("__Sy"), sum(col("y") * col("y")).as("__Qy"))
    val lags = spark.range(-maxLag.toLong, maxLag + 1L).toDF("lag")
    val pairs = series.select(col("h"), col("x").as("__xa"))
      .crossJoin(broadcast(lags))
      .join(series.select(col("h").as("__hb"), col("y").as("__yb")),
        col("__hb") === col("h") + col("lag"))
    def m(s: String) = col(s).cast("double") / col("__T").cast("double")
    def dev(s: String, q: String) = col(q).cast("double") -
      col(s).cast("double") * col(s).cast("double") / col("__T").cast("double")
    val num = col("__pxy").cast("double") - m("__Sy") * col("__pa") -
      m("__Sx") * col("__pb") + col("n_pairs") * m("__Sx") * m("__Sy")
    val denom = sqrt(dev("__Sx", "__Qx") * dev("__Sy", "__Qy"))
    pairs.groupBy(col("lag"))
      .agg(sum(col("__xa") * col("__yb")).as("__pxy"),
        sum(col("__xa")).as("__pa"), sum(col("__yb")).as("__pb"),
        count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(stats))
      .select(col("lag"), col("n_pairs"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(round(num / denom + lit(1e-12), 6)).as("ccf"))
  }

  /** Seasonal profile of the event-count series: bucket into
    * `bucketWidth` bins, densify (gaps count 0, as in [[acf]]), fold
    * each bucket onto its phase = bucket mod `period` (period 24 on
    * hourly buckets = hour-of-day), and report the per-phase mean, its
    * deviation from the grand mean, and the SEASONALITY STRENGTH
    * 1 − SSR/SST — the share of series variance the phase explains
    * (the one-way eta² of phase; the STL-style strength measure for a
    * pure seasonal-plus-residual decomposition).
    *
    * Exactness: per-phase (c, Σx, Σx²) are exact longs;
    * SSR = Σ_phase (Q_p − S_p²/c_p) and SST = Q − S²/T are a
    * period-bounded handful of double ops on them (the same
    * decimal-moment discipline as [[HypothesisTests.anovaF]], which
    * this is, run on the series instead of raw values).
    *
    * Scale shape: one corpus groupBy to bucket counts; everything
    * after is series- then period-sized. Output per OBSERVED phase:
    * `phase`, `n_buckets`, `mean_count`, `seasonal` (mean − grand
    * mean), `strength` (identical on every row; rounded 6, null when
    * the series is constant). Empty input → empty output.
    */
  def seasonalProfile(df: DataFrame, tsCol: String, bucketWidth: Long,
                      period: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(period >= 2, s"period must be >= 2, got $period")
    val spark = df.sparkSession
    val counts = df.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"$tsCol div $bucketWidth").as("h"))
      .agg(count(lit(1)).as("x"))
    val bounds = counts.agg(min(col("h")), max(col("h"))).head
    if (bounds.isNullAt(0))
      return spark.range(0).select(col("id").as("phase"),
        col("id").as("n_buckets"), lit(null).cast("double").as("mean_count"),
        lit(null).cast("double").as("seasonal"),
        lit(null).cast("double").as("strength"))
    val byPhase = spark.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .toDF("h")
      .join(counts, Seq("h"), "left")
      .select((col("h") % period).as("phase"),
        coalesce(col("x"), lit(0L)).as("x"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("x")).as("__s"),
        sum(col("x") * col("x")).as("__q"))
    // totals ride a global window over the period-sized table (the
    // Drift pattern) — a crossJoin with an aggregate of the same
    // subtree would hit Spark's ambiguous-self-join resolution
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // total columns get distinct names: resolution is case-insensitive,
    // so a "__S" withColumn would silently REPLACE the per-phase "__s"
    val mean = col("__s").cast("double") / col("n_buckets").cast("double")
    val grand = col("__ts").cast("double") / col("__tn").cast("double")
    val sst = col("__tq").cast("double") - col("__ts").cast("double") *
      col("__ts").cast("double") / col("__tn").cast("double")
    byPhase
      .withColumn("__tn", sum(col("n_buckets")).over(w))
      .withColumn("__ts", sum(col("__s")).over(w))
      .withColumn("__tq", sum(col("__q")).over(w))
      .withColumn("__ssr", sum(col("__q").cast("double")
        - col("__s").cast("double") * col("__s").cast("double")
          / col("n_buckets").cast("double")).over(w))
      .select(col("phase"), col("n_buckets"),
        round(mean + lit(1e-12), 6).as("mean_count"),
        round(mean - grand + lit(1e-12), 6).as("seasonal"),
        when(sst === 0.0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("__ssr") / sst + lit(1e-12), 6))
          .as("strength"))
  }

  def acf(df: DataFrame, tsCol: String, bucketWidth: Long,
          maxLag: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val spark = df.sparkSession
    val counts = df.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"$tsCol div $bucketWidth").as("h"))
      .agg(count(lit(1)).as("x"))
    val bounds = counts.agg(min(col("h")), max(col("h"))).head
    if (bounds.isNullAt(0))
      return spark.range(0).select(col("id").as("lag"),
        col("id").as("n_pairs"), lit(null).cast("double").as("acf"))
    val series = spark.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .toDF("h")
      .join(counts, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint()
    val stats = series.agg(count(lit(1)).as("__T"), sum(col("x")).as("__S"),
      sum(col("x") * col("x")).as("__Q"))
    val lags = spark.range(1L, maxLag + 1L).toDF("lag")
    val pairs = series.select(col("h"), col("x").as("__xa"))
      .crossJoin(broadcast(lags))
      .join(series.select(col("h").as("__hb"), col("x").as("__xb")),
        col("__hb") === col("h") + col("lag"))
    val m = col("__S").cast("double") / col("__T").cast("double")
    val denom = col("__Q").cast("double") -
      col("__S").cast("double") * col("__S").cast("double") /
        col("__T").cast("double")
    val num = col("__pxy").cast("double") - m * col("__pa") -
      m * col("__pb") + col("n_pairs") * m * m
    pairs.groupBy(col("lag"))
      .agg(sum(col("__xa") * col("__xb")).as("__pxy"),
        sum(col("__xa")).as("__pa"), sum(col("__xb")).as("__pb"),
        count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(stats))
      .select(col("lag"), col("n_pairs"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(round(num / denom + lit(1e-12), 6)).as("acf"))
  }

  /** Mann–Kendall trend test + Theil–Sen slope over the dense bucket
    * series — the nonparametric "is volume actually trending?" audit
    * (monotone-trend S statistic with the tie-corrected normal
    * approximation, and the median-of-pairwise-slopes estimator that a
    * single outlier bucket can't drag the way least squares can; the
    * robust complement of q_regression).
    *
    * Exactness: S = Σ sign(x_j − x_i) over i<j pairs is an exact
    * integer; Var(S) = (T(T−1)(2T+5) − Σ t(t−1)(2t+5))/18 comes from
    * exact longs (the tie sum re-aggregates the series by value);
    * pairwise slopes are single-division doubles and their median runs
    * through [[Percentiles.fromHistogram]] — the same interpolation as
    * the exact-percentile oracle path. z applies the standard ±1
    * continuity correction and nulls when Var(S) = 0 (all buckets
    * tied).
    *
    * Scale shape: the corpus collapses to the localCheckpoint'd dense
    * series ONCE (the only corpus-sized stage); the T(T−1)/2 pair join
    * is then series-local — T is time-range-bounded (buckets between
    * min and max ts), corpus-INDEPENDENT, so the quadratic is a fixed
    * cost knob set by `bucketWidth`, not a scale risk (141 daily
    * buckets → ~10k pairs at ANY corpus size). One output row:
    * `n_buckets`, `s_stat`, `var_s`, `mk_z`, `sen_slope`.
    *
    * CAVEAT: "corpus-independent" holds only for sane time ranges. A
    * single outlier timestamp (epoch-0 sentinel, corrupt far-future
    * date) silently inflates the min-to-max grid, and with it the
    * T(T−1)/2 pair join — `maxBuckets` turns that silent blowup into a
    * fail-fast. Clean the series (or widen `bucketWidth`) rather than
    * raising the cap: 10k buckets ≈ 50M nested-loop pairs is already
    * the practical ceiling for an audit statistic.
    */
  def mannKendall(df: DataFrame, tsCol: String, bucketWidth: Long,
                  maxBuckets: Long = 10000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxBuckets > 0, s"maxBuckets must be > 0, got $maxBuckets")
    val spark = df.sparkSession
    val counts = df.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"$tsCol div $bucketWidth").as("h"))
      .agg(count(lit(1)).as("x"))
    val bounds = counts.agg(min(col("h")), max(col("h"))).head
    if (bounds.isNullAt(0))
      return spark.range(0).select(col("id").as("n_buckets"),
        col("id").as("s_stat"), lit(null).cast("double").as("var_s"),
        lit(null).cast("double").as("mk_z"),
        lit(null).cast("double").as("sen_slope"))
    val span = bounds.getLong(1) - bounds.getLong(0) + 1
    require(span <= maxBuckets,
      s"mannKendall grid spans $span buckets (> maxBuckets=$maxBuckets): " +
        s"the T(T-1)/2 pair join would materialize ~${span * (span - 1) / 2} " +
        "pairs. An outlier timestamp usually causes this — filter the series " +
        "to its sane range or widen bucketWidth.")
    val series = spark.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .toDF("h")
      .join(counts, Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint()
    val pairs = series.select(col("h").as("__ha"), col("x").as("__xa"))
      .join(series.select(col("h").as("__hb"), col("x").as("__xb")),
        col("__hb") > col("__ha"))
    val stat = pairs.agg(
      sum(when(col("__xb") > col("__xa"), 1L)
        .when(col("__xb") < col("__xa"), -1L).otherwise(0L)).as("s_stat"))
    val ties = series.groupBy(col("x")).agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1)
        * (lit(2L) * col("__t") + 5)), lit(0L)).as("__tt"))
    val n = series.agg(count(lit(1)).as("n_buckets"))
    val sen = Percentiles.fromHistogram(
      pairs.select(((col("__xb") - col("__xa")).cast("double")
          / (col("__hb") - col("__ha")).cast("double")).as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__cnt")),
      Nil, "__v", "__cnt", Seq(0.5), out = "__ps")
    val t = col("n_buckets")
    val varS = (t * (t - 1) * (lit(2L) * t + 5) - col("__tt")).cast("double") / 18.0
    val sD = col("s_stat").cast("double")
    n.crossJoin(broadcast(stat)).crossJoin(broadcast(ties))
      .join(sen, lit(true), "left") // T<2 → no slopes → null sen_slope
      .select(col("n_buckets"), col("s_stat"),
        round(varS + lit(1e-12), 6).as("var_s"),
        when(varS === 0.0, lit(null).cast("double"))
          .otherwise(round(
            when(sD > 0, (sD - 1) / sqrt(varS))
              .when(sD < 0, (sD + 1) / sqrt(varS))
              .otherwise(lit(0.0)) + lit(1e-12), 6)).as("mk_z"),
        round(element_at(col("__ps"), 1) + lit(1e-12), 6).as("sen_slope"))
  }

  /** Classical moving-average decomposition of an event-count series:
    * count per bucket → centered (2·halfWindow+1)-row moving-average
    * TREND → per-phase mean of the detrended series (SEASONAL index,
    * phase = bucket mod period) → RESIDUAL. The additive little
    * sibling of STL, and the standard first look at a telemetry
    * series.
    *
    * Scale shape: the corpus-sized work is ONE map-side-combined
    * count aggregate; everything after runs on the densified bucket
    * grid, which is time-range-bounded (span-guarded against outlier
    * timestamps exactly like [[mannKendall]]) — so the unpartitioned
    * trend window orders a bounded series, not the corpus. Detrended
    * values are rounded to 6 dp and summed as DECIMAL(18,6), making
    * the per-phase means order-independent and engine-identical.
    *
    * Output per bucket: bucket, n_events, trend, phase, seasonal,
    * residual (trend/seasonal/residual rounded to 6 dp).
    */
  /** Holt double exponential smoothing (level + linear trend) per key,
    * with the one-step-ahead forecast l + b — the standard capacity /
    * throughput projection over a bucketed event series (EWMA alone
    * lags a trending series by a constant; Holt tracks the slope).
    *
    *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * seeded l_1 = y_1, b_1 = 0. Both states snap to the 1e-6 grid after
    * EVERY step, so the whole trajectory replays bit-for-bit in a SQL
    * recursive CTE (the k-means inter-iteration quantization idiom) —
    * and the coupled recurrence, inherently sequential, stays inside
    * the engine as [[graft.functions.HoltStatesAgg]]: ONE linear fold
    * per series producing every row's (level, trend, forecast) in a
    * single aggregate, exploded and joined back on (keys, order).
    *
    * Cost shape: O(T log T) per series (the in-eval sort) — the
    * windowed prefix-re-fold formulation this replaced
    * ([[holtViaWindow]], kept as the differential reference) was O(T²)
    * in a key's OWN series length, which is why it carried a maxLen
    * compute guard. Here `maxLen` only bounds the per-group buffer
    * (series held in memory during the fold: 17 bytes/row). Nulls in
    * `valueCol` keep the prior state (exactly the frame-collect
    * semantics); rows with a null `orderCol` get null states.
    *
    * Appends `level`, `trend`, `forecast`. α/β are embedded in the
    * aggregate; `orderCol` must be integral (it keys the join back). */
  def holt(df: DataFrame, keyCols: Seq[String], orderCol: String,
           valueCol: String, alpha: Double, beta: Double,
           maxLen: Int = 10000): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    // One profiling job guards BOTH preconditions: series length (the
    // per-group fold buffer) and (key, order) uniqueness. HoltStatesAgg
    // emits one state row keyed only by `order`, so a duplicate order
    // within a key would fan out the join-back (2 input rows sharing an
    // order -> 4 output rows) AND make the fold merge-order-dependent —
    // Holt over a series with tied timestamps is ill-defined, so refuse
    // loudly rather than pick a winner (ADVICE r9).
    val prof = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        (count(col(orderCol)) - countDistinct(col(orderCol))).as("__dup"))
      .agg(max(col("__n")), max(col("__dup"))).head
    if (!prof.isNullAt(0)) {
      require(prof.getLong(0) <= maxLen,
        s"holt: a key's series has ${prof.getLong(0)} buckets (> maxLen=" +
          s"$maxLen) — the whole series folds in one aggregation buffer; " +
          "widen the bucket or filter outlier timestamps.")
      require(prof.getLong(1) == 0L,
        s"holt: duplicate ($keyCols, $orderCol) rows — the smoothing " +
          "recurrence needs one observation per key per order value; " +
          "aggregate the duplicates first (e.g. avg per bucket).")
    }
    val states = df.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.HoltStatesAgg.holtStates(
        col(orderCol).cast("long"), col(valueCol).cast("double"),
        alpha, beta).as("__hs"))
      .select((keyCols.map(col) :+ explode(col("__hs")).as("__h")): _*)
      .select((keyCols.map(col) :+ col("__h.order").as("__ho")
        :+ col("__h.level").as("level") :+ col("__h.trend").as("trend")
        :+ col("__h.forecast").as("forecast")): _*)
    df.withColumn("__ho", col(orderCol).cast("long"))
      .join(states, keyCols :+ "__ho", "left")
      .drop("__ho")
  }

  /** The windowed prefix-re-fold formulation [[holt]] replaced — kept
    * as the differential reference (OperatorsSpec proves the aggregate
    * path reproduces it bit-for-bit): collect_list over an unbounded-
    * preceding frame re-folds row i's whole prefix, O(T²) per series.
    */
  private[graft] def holtViaWindow(df: DataFrame, keyCols: Seq[String],
                                   orderCol: String, valueCol: String,
                                   alpha: Double, beta: Double): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val frame = collect_list(col(valueCol).cast("double")).over(w)
    val st = aggregate(frame,
      struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(false).as("s")),
      (acc: Column, x: Column) => {
        val l0 = acc.getField("l")
        val b0 = acc.getField("b")
        val nl = round(lit(alpha) * x + lit(1 - alpha) * (l0 + b0)
          + lit(1e-12), 6)
        val nb = round(lit(beta) * (nl - l0) + lit(1 - beta) * b0
          + lit(1e-12), 6)
        val first = !acc.getField("s")
        struct(when(first, x).otherwise(nl).as("l"),
          when(first, lit(0.0)).otherwise(nb).as("b"),
          lit(true).as("s"))
      })
    df.withColumn("__st", st)
      .withColumn("level", col("__st").getField("l"))
      .withColumn("trend", col("__st").getField("b"))
      .withColumn("forecast",
        round(col("__st").getField("l") + col("__st").getField("b")
          + lit(1e-12), 6))
      .drop("__st")
  }

  def trendDecompose(df: DataFrame, tsCol: String, bucketWidth: Long,
                     period: Int, halfWindow: Int = 3,
                     maxBuckets: Long = 100000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(period >= 2, s"period must be >= 2, got $period")
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val spark = df.sparkSession
    val counts = df.filter(col(tsCol).isNotNull)
      .groupBy(expr(s"$tsCol div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = counts.agg(min(col("bucket")), max(col("bucket"))).head
    require(!bounds.isNullAt(0), "trendDecompose: empty series")
    val span = bounds.getLong(1) - bounds.getLong(0) + 1
    require(span <= maxBuckets,
      s"trendDecompose grid spans $span buckets (> maxBuckets=" +
        s"$maxBuckets) — an outlier timestamp usually causes this; " +
        "filter the series or widen bucketWidth.")
    val series = spark.range(bounds.getLong(0), bounds.getLong(1) + 1)
      .toDF("bucket")
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(-halfWindow, halfWindow)
    // single long-division per row: deterministic IEEE, then 6-dp round
    val trended = series.select(col("bucket"), col("n_events"),
      round(sum(col("n_events")).over(w).cast("double")
        / count(lit(1)).over(w).cast("double") + lit(1e-12), 6).as("trend"),
      pmod(col("bucket"), lit(period.toLong)).as("phase"))
      .withColumn("__detr",
        round(col("n_events").cast("double") - col("trend") + lit(1e-12), 6)
          .cast("decimal(18,6)"))
    val seasonal = trended.groupBy(col("phase"))
      .agg(round(sum(col("__detr")).cast("double")
        / count(lit(1)).cast("double") + lit(1e-12), 6).as("seasonal"))
    trended.join(broadcast(seasonal), Seq("phase"))
      .select(col("bucket"), col("n_events"), col("trend"), col("phase"),
        col("seasonal"),
        round(col("__detr").cast("double") - col("seasonal") + lit(1e-12), 6)
          .as("residual"))
  }

  /** Durbin–Watson autocorrelation statistic of the [[trendDecompose]]
    * residual series — the "did the model leave structure behind?"
    * diagnostic (DW ≈ 2 means white residuals; → 0 positive, → 4
    * negative lag-1 autocorrelation):
    * DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t².
    *
    * The lag window is a single ordered pass over the DENSIFIED bucket
    * series — time-span-bounded, corpus-independent (the
    * [[kaplanMeier]]-style deliberate tiny-input window); residuals
    * are the decomposition's rounded-6 doubles, so both engines fold
    * identical values. One output row: `n_buckets`, `dw` (rounded 6;
    * null when Σe² = 0 — a perfectly explained series).
    */
  def durbinWatson(df: DataFrame, tsCol: String, bucketWidth: Long,
                   period: Int, halfWindow: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val res = trendDecompose(df, tsCol, bucketWidth, period, halfWindow)
      .select(col("bucket"), col("residual"))
    val w = Window.orderBy(col("bucket"))
    val diff = col("residual") - lag(col("residual"), 1).over(w)
    res.withColumn("__d", diff)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__d") * col("__d")).as("__num"),
        sum(col("residual") * col("residual")).as("__den"))
      .select(col("n_buckets"),
        when(col("__den") === 0.0, lit(null).cast("double"))
          .otherwise(round(col("__num") / col("__den") + lit(1e-12), 6)).as("dw"))
  }
}
