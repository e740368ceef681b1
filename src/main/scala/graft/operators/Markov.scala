package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key ordered event
  * sequences — the behavioral-analytics summary ("after a click, what
  * comes next?") and the generative model behind session simulation and
  * anomaly scoring (improbable transition chains).
  *
  * Scale shape: one `lag` window per key (a single range-partitioned
  * sort, parallelism = keys) produces the (prev, next) stream; the
  * matrix itself is a groupBy over state pairs — output is
  * |states|²-bounded no matter the corpus size, with map-side partial
  * aggregation doing almost all the work. Probabilities are exact
  * integer ratios (count / row-total via a window over the tiny matrix),
  * so results are partitioning-independent.
  */
object Markov {

  /** Output: `from_state`, `to_state`, `n` (observed transitions),
    * `p` (row-normalized probability, rounded 6). The first event of
    * each key has no predecessor and contributes nothing. Ordering must
    * be total per key — pass tie-breaking `orderCols`.
    */
  def transitionMatrix(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                       stateCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val rowTot = Window.partitionBy(col("from_state"))
    df.select(keyCols.map(col) ++ orderCols.map(col) :+ col(stateCol).as("to_state"): _*)
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .filter(col("from_state").isNotNull)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(rowTot) + lit(1e-12), 6))
  }
}
