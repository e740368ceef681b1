package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bayesian-bootstrap confidence intervals (Rubin 1981) for grouped
  * means — "measure, don't guess" with error bars: a corpus statistic
  * quoted without a CI hides whether 10× more data would move it.
  *
  * Classic bootstrap resampling (draw n rows with replacement, B times)
  * is awkward distributed: multinomial draws need coordination. The
  * Bayesian bootstrap replaces draws with CONTINUOUS per-row weights
  * w ~ Exp(1) (jointly Dirichlet after normalization) — and with
  * w = −ln(u), u the 52-bit md5 uniform of (key, replicate), the
  * weights are deterministic, partitioning-invariant, and replayable by
  * any engine with md5 (the [[Sampling.weightedSample]] idiom).
  *
  * One pass: explode B replicates per row (B× scan cost, the honest
  * price of B resamples), map-side combine to B weighted-sum rows per
  * (group, partition), then the CI is an order statistic over B
  * resample means per group — group-cardinality work from there on.
  */
object Bootstrap {

  /** Per group: `n`, `mean` (plain), `ci_lo`, `ci_hi` (empirical
    * order-statistic quantiles of the B resample means at `lo`/`hi`),
    * all rounded to 6 decimals. Null values are excluded. */
  def meanCI(df: DataFrame, groupCols: Seq[String], valueCol: String,
             keyCol: String, b: Int = 40,
             lo: Double = 0.025, hi: Double = 0.975): DataFrame = {
    require(b >= 2, s"need at least 2 replicates, got $b")
    require(lo > 0 && hi < 1 && lo < hi, s"need 0 < lo < hi < 1, got $lo/$hi")
    val loIdx = math.max(1, math.floor(lo * b).toInt)
    val hiIdx = math.min(b, math.ceil(hi * b).toInt)
    val g = groupCols.map(col)
    val x = col(valueCol).cast("double")
    val rows = df.filter(col(valueCol).isNotNull)
      .withColumn("__bb", explode(sequence(lit(0), lit(b - 1))))
    val u = conv(substring(md5(concat(col(keyCol).cast("string"), lit("#"),
      col("__bb").cast("string"))), 1, 13), 16, 10).cast("double") / pow(lit(16.0), lit(13.0))
    val perRep = rows
      .withColumn("__w", -log(u))
      .groupBy(g :+ col("__bb"): _*)
      .agg((sum(col("__w") * x) / sum(col("__w"))).as("__mb"))
    val rn = row_number().over(
      Window.partitionBy(g: _*).orderBy(col("__mb"), col("__bb")))
    val ci = perRep.withColumn("__rn", rn)
      .groupBy(g: _*)
      .agg(round(max(when(col("__rn") === loIdx, col("__mb"))) + lit(1e-12), 6).as("ci_lo"),
        round(max(when(col("__rn") === hiIdx, col("__mb"))) + lit(1e-12), 6).as("ci_hi"))
    val stats = df.filter(col(valueCol).isNotNull)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"), round(avg(x) + lit(1e-12), 6).as("mean"))
    stats.join(ci, groupCols)
      .select(g ++ Seq(col("n"), col("mean"), col("ci_lo"), col("ci_hi")): _*)
  }

  /** Leave-one-group-out influence (jackknife by category): for each
    * category c, the corpus mean of `valueCol` WITHOUT c and its delta
    * against the full mean — "which source is moving the metric", the
    * data-valuation triage that decides what to re-crawl or drop.
    * Exact and cheap: one global sum, one per-category sum,
    * mean₋c = (S − S_c)/(N − n_c) — no per-category rescan of the
    * corpus, category-cardinality work after a single aggregate.
    * Output per category: `n`, `mean_all`, `mean_without`, `influence`
    * (= mean_all − mean_without: positive means the category pulls the
    * mean UP). A category covering the whole corpus yields nulls
    * (nothing remains without it).
    */
  def leaveOneOutMeans(df: DataFrame, catCol: String,
                       valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val rows = df.filter(col(valueCol).isNotNull)
    val per = rows.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(x).as("s"))
    val tot = per.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"))
    val without = (col("ss") - col("s")) / (col("nn") - col("n"))
    per.crossJoin(broadcast(tot))
      .select(col(catCol), col("n"),
        round(col("ss") / col("nn") + lit(1e-12), 6).as("mean_all"),
        when(col("nn") > col("n"),
          round(without + lit(1e-12), 6)).as("mean_without"),
        when(col("nn") > col("n"),
          round(col("ss") / col("nn") - without + lit(1e-12), 6)).as("influence"))
  }
}
