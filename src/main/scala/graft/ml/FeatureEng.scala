package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-engineering primitives for tabular training data: smoothed
  * leave-one-out target encoding, the hashing trick, and per-group
  * scaling. Each is a one-or-two-scan dataflow whose only shuffles are
  * category-sized aggregates (broadcast back to the corpus scan) — the
  * shapes that survive a 100× scale-up unchanged.
  */
object FeatureEng {

  /** Smoothed leave-one-out target encoding of a categorical column:
    * each row's encoding is the target mean of its category computed
    * WITHOUT the row itself (the standard leakage guard), shrunk toward
    * the global prior by pseudo-count `m`:
    *
    *   te = (S_g − y_i + m·p) / (n_g − 1 + m),   p = S/N (global mean)
    *
    * Labels are taken as numeric (booleans cast to 0/1). Requires
    * m > 0 (m = 0 would divide by zero on singleton categories; the
    * smoothing is also what makes the encoding usable on rare
    * categories). Null category or label rows drop.
    *
    * Scale shape: ONE corpus-sized groupBy builds (n_g, S_g) —
    * category-sized output, map-side combined; the global prior is a
    * 1-row re-aggregate of that table; both broadcast back onto a
    * single corpus scan. Label sums ride exact longs, so the encoding
    * is partitioning-independent.
    *
    * Output: idCol, catCol, `y`, `te` (rounded 6).
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      labelCol: String, m: Double): DataFrame = {
    require(m > 0, s"smoothing pseudo-count m must be > 0, got $m")
    val base = df.select(col(idCol), col(catCol),
        col(labelCol).cast("long").as("y"))
      .filter(col(catCol).isNotNull && col("y").isNotNull)
    val perCat = base.groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"), sum(col("y")).as("__s"))
    val prior = perCat.agg((sum(col("__s")).cast("double")
      / sum(col("__n")).cast("double")).as("__p"))
    base.join(broadcast(perCat), catCol).crossJoin(broadcast(prior))
      .select(col(idCol), col(catCol), col("y"),
        round(((col("__s") - col("y")).cast("double") + lit(m) * col("__p"))
          / ((col("__n") - 1).cast("double") + lit(m)) + lit(1e-12), 6).as("te"))
  }

  /** The hashing trick over categorical columns: each (column, value)
    * pair maps to index `md5(name=value)[0,8) mod dim` with a ±1 sign
    * from the 9th hex digit's parity; same-index collisions within a
    * row sum (the signed construction keeps collision noise
    * zero-mean — Weinberger et al.'s signed feature hashing). md5 makes
    * the mapping engine-portable: any system that can hash hex can
    * reproduce the exact feature space, so train/serve skew is
    * impossible by construction.
    *
    * Pure scan-stage arithmetic (no shuffle until the per-row collision
    * sum, which is (id × ≤|cols|)-sized and map-side combined). Output:
    * idCol, `feat_idx`, `feat_val` — the sparse COO triple layout.
    */
  def featureHash(df: DataFrame, idCol: String, cols: Seq[String],
                  dim: Int): DataFrame = {
    require(dim > 0, s"dim must be > 0, got $dim")
    require(cols.nonEmpty, "featureHash needs at least one input column")
    def h(name: String, c: Column) = md5(concat(lit(name), lit("="), c))
    val features = cols.map { name =>
      val hh = h(name, col(name).cast("string"))
      df.filter(col(name).isNotNull)
        .select(col(idCol),
          pmod(conv(substring(hh, 1, 8), 16, 10).cast("long"), lit(dim.toLong))
            .as("feat_idx"),
          (conv(substring(hh, 9, 1), 16, 10).cast("long") % 2 * 2 - 1)
            .as("__sign"))
    }.reduce(_ unionByName _)
    features.groupBy(col(idCol), col("feat_idx"))
      .agg(sum(col("__sign")).as("feat_val"))
  }

  /** Per-group feature scaling: z-score (sample standard deviation) and
    * min-max, with the scaling parameters computed once per group and
    * broadcast back — the train-time statistics a serving path would
    * persist. Moments ride DECIMAL(18,2)/(38,4) (exact for 2-decimal
    * data), so the parameters are order-independent; z is null when the
    * group is constant (std = 0) or a singleton, minmax null when
    * max = min.
    *
    * Output: passthrough idCol + groupCols, `z`, `minmax` (rounded 6).
    */
  def scaleFeatures(df: DataFrame, idCol: String, groupCols: Seq[String],
                    valCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val v = col(valCol).cast("decimal(18,2)")
    val base = df.filter(col(valCol).isNotNull)
      .select(col(idCol) +: gcols :+ v.as("__v"): _*)
    val stats = base.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"),
        min(col("__v")).as("__min"), max(col("__v")).as("__max"))
    val mean = col("__s").cast("double") / col("__n").cast("double")
    val std = sqrt((col("__q").cast("double")
      - col("__s").cast("double") * col("__s").cast("double")
        / col("__n").cast("double")) / (col("__n") - 1).cast("double"))
    val range = (col("__max") - col("__min")).cast("double")
    base.join(broadcast(stats), groupCols)
      .select(col(idCol) +: gcols ++: Seq(
        when(col("__n") < 2 || std === 0.0, lit(null).cast("double"))
          .otherwise(round((col("__v").cast("double") - mean) / std
            + lit(1e-12), 6)).as("z"),
        when(range === 0.0, lit(null).cast("double"))
          .otherwise(round((col("__v") - col("__min")).cast("double") / range
            + lit(1e-12), 6)).as("minmax")): _*)
  }
}
