package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audits over quasi-identifier combinations — the
  * data-governance gate before a corpus ships: how many rows are
  * re-identifiable because their quasi-identifier combination is
  * rare (k-anonymity), and do small groups leak their sensitive value
  * outright because it's constant within the group (l-diversity)?
  *
  * Scale shape: ONE corpus-sized groupBy on the quasi columns
  * (map-side combined, output = distinct-combination-sized) carries
  * both the group size and the distinct-sensitive count; the summary
  * is a 1-row re-aggregate. Exact longs end to end.
  */
object Privacy {

  /** One summary row: `n_rows`, `n_groups`, `min_group` (the corpus's
    * k-anonymity level), `risky_groups`/`risky_rows` (groups of size
    * < k and the rows in them), `risky_pct` (rounded 6), `l_min`
    * (minimum distinct sensitive values over groups — the corpus's
    * l-diversity level), `leaky_groups` (groups with a single
    * sensitive value). Rows with any null quasi value form their own
    * combinations (null is a value an attacker sees too); null
    * sensitive values don't count toward diversity.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__l"))
    groups.agg(
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("__n")).as("min_group"),
      sum(when(col("__n") < k, 1L).otherwise(0L)).as("risky_groups"),
      sum(when(col("__n") < k, col("__n")).otherwise(lit(0L))).as("risky_rows"),
      min(col("__l")).as("l_min"),
      sum(when(col("__l") === 1, 1L).otherwise(0L)).as("leaky_groups"))
      .select(col("n_rows"), col("n_groups"), col("min_group"),
        col("risky_groups"), col("risky_rows"),
        round(col("risky_rows").cast("double") / col("n_rows").cast("double")
          + lit(1e-12), 6).as("risky_pct"),
        col("l_min"), col("leaky_groups"))
  }
}
