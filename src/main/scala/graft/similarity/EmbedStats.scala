package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second-moment statistics over an embedding column — the input to
  * PCA/whitening and to covariance-based drift monitors, computed as a
  * single distributed pass.
  */
object EmbedStats {

  /** Gram matrix G[i][j] = Σ_rows v_i * v_j (upper triangle, i <= j),
    * plus the per-dimension mean — everything PCA needs (covariance =
    * G/n − mean·meanᵀ; eigendecompose the k×k result anywhere, it is
    * tiny).
    *
    * Scale shape: each row explodes to its k² outer-product entries,
    * but the groupBy(i,j) hash aggregate collapses them map-side — the
    * exchange carries at most k² rows PER PARTITION, independent of row
    * count, and the final stage is k² groups. For k where k² per-row
    * expansion is too hot (k ≳ 10³), the same contract would move into
    * a TypedImperativeAggregate holding a k²/2 buffer; at typical
    * embedding widths the explode keeps everything in codegen'd
    * built-ins. Elements are cast to double BEFORE multiplying so the
    * arithmetic is engine-reproducible (float multiply then double sum
    * is not).
    *
    * Output: `i`, `j` (0-based ints, i <= j), `gram` = Σ v_i·v_j,
    * `mean_i` = mean of dimension i, `n` rows — all rounded to 6.
    */
  /** [[gramMatrix]] through the [[graft.functions.GramAgg]] flat-buffer
    * aggregate — identical output schema/values (GraphSpec differential-
    * pins it), but each partition ships one ≈17 KB blob instead of k²
    * aggregation rows, and no k²-entry row stream ever materializes.
    * This is the production path; the explode form remains as the
    * all-built-ins reference implementation.
    */
  def gramMatrixAgg(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.agg(graft.functions.GramAgg.gramAgg(col(embCol), dim).as("__g"))
      .select(explode(col("__g")).as("g"))
      .select(col("g.i").as("i"), col("g.j").as("j"),
        round(col("g.gram"), 6).as("gram"),
        round(col("g.mean_i"), 6).as("mean_i"),
        col("g.n").as("n"))
  }

  def gramMatrix(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val v = transform(col(embCol), x => x.cast("double"))
    // each entry carries (product, row's value of dim i) so the aggregate
    // below gets both without re-carrying the whole vector per entry
    val outer = flatten(transform(v, x =>
      transform(v, y => struct((x * y).as("xy"), x.as("vi")))))
    df.select(posexplode(outer).as(Seq("pos", "e")))
      .select((col("pos") / dim).cast("int").as("i"),
        (col("pos") % dim).cast("int").as("j"),
        col("e.xy").as("xy"), col("e.vi").as("vi"))
      .filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(round(sum(col("xy")), 6).as("gram"),
        round(avg(col("vi")), 6).as("mean_i"),
        count(lit(1)).as("n"))
  }
}
