package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reliability diagram + expected calibration error (ECE) for a
  * probabilistic scorer — the audit a pipeline runs on its quality /
  * toxicity / language classifier before trusting the scores as keep
  * probabilities: "when the model says 0.8, is it right 80% of the
  * time?" (Guo et al. 2017's binned ECE.)
  *
  * Scale shape: one groupBy on the bin id (≤ `bins` groups, map-side
  * combined) + a 1-row reduce for the ECE — two scans, nothing sorted,
  * nothing collected. Exactness: scores are expected pre-rounded (6
  * decimals — the house convention for model columns) and are summed as
  * DECIMAL(16,6), so per-bin confidence is order-independent and
  * engine-exact; accuracy is an integer ratio.
  */
object Calibration {

  /** Output: one row per non-empty bin — `bin` (0-based, uniform over
    * [0,1], the top edge closed), `n`, `confidence` (mean score),
    * `accuracy` (mean label), `gap` = |acc − conf|, plus the scalar
    * `ece` = Σ n_b/N · gap_b repeated on every row (crossJoined 1-row
    * aggregate, never collected). `labelCol` must be boolean-like
    * (cast to int 0/1); rows with null score or label drop.
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val p = col(scoreCol).cast("double")
    val binned = df
      .filter(p.isNotNull && col(labelCol).isNotNull)
      .select(
        least(greatest(floor(p * bins).cast("long"), lit(0L)), lit(bins - 1L)).as("bin"),
        p.cast("decimal(16,6)").as("__p"),
        col(labelCol).cast("int").cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__p")).as("__sp"), sum(col("__y")).as("__sy"))
      .select(col("bin"), col("n"),
        (col("__sp").cast("double") / col("n")).as("confidence"),
        (col("__sy").cast("double") / col("n")).as("accuracy"))
      .withColumn("gap", abs(col("accuracy") - col("confidence")))
    val ece = binned
      .agg((sum(col("n") * col("gap")) / sum(col("n"))).as("__e"))
      .select(round(col("__e") + lit(1e-12), 6).as("ece"))
    binned
      .select(col("bin"), col("n"),
        round(col("confidence") + lit(1e-12), 6).as("confidence"),
        round(col("accuracy") + lit(1e-12), 6).as("accuracy"),
        round(col("gap") + lit(1e-12), 6).as("gap"))
      .crossJoin(broadcast(ece))
  }
}
