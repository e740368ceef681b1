package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization: per-dimension linear int8 codes — the
  * memory-bandwidth counterpart to [[Pq]] (PQ compresses geometry,
  * SQ8 compresses every coordinate independently; 4× over float32 with
  * trivial decode, the common first rung of an ANN storage hierarchy).
  *
  * Two passes, neither shuffling the corpus: (1) one aggregate row of
  * per-dimension min/max (2·dim doubles — the legitimate driver-side
  * collect, same regime as IVF's k centroids), (2) a scan-stage encode
  * with the bounds compiled in as plan literals — code_i =
  * ⌊(x−min_i)/(max_i−min_i)·255⌋, exactly engine-replayable because
  * min/max are exact comparisons and the scale arithmetic is written in
  * one fixed operation order.
  */
object Sq8 {

  final case class Bounds(mins: Seq[Double], maxs: Seq[Double])

  /** Per-dimension global [min, max] as ONE aggregate (2·dim doubles). */
  def trainBounds(df: DataFrame, embCol: String, dim: Int): Bounds = {
    val e = Similarity.toDouble(col(embCol))
    val row = df.select(e.as("__e"))
      .agg(array((0 until dim).map(i => min(col("__e").getItem(i))): _*).as("mn"),
        array((0 until dim).map(i => max(col("__e").getItem(i))): _*).as("mx"))
      .head()
    Bounds(row.getSeq[Double](0), row.getSeq[Double](1))
  }

  private def litArray(vs: Seq[Double]): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    org.apache.spark.sql.graft.bridge.toColumn(
      CatLit.create(vs.toArray, ArrayType(DoubleType, false)))
  }

  /** Appends `codes` (int array, 0..255) and `recon_err` (squared L2
    * reconstruction error against the midpoint decode
    * x̂_i = min_i + (code_i + 0.5)·range_i/255). Zero-width dimensions
    * (min = max) encode as 0 and decode exactly. */
  def encode(df: DataFrame, embCol: String, idCol: String,
             bounds: Bounds): DataFrame = {
    val mn = litArray(bounds.mins)
    val mx = litArray(bounds.maxs)
    val e = Similarity.toDouble(col(embCol))
    val codes = transform(e, (x, i) => {
      val lo = element_at(mn, i + 1)
      val range = element_at(mx, i + 1) - lo
      when(range > 0.0, floor((x - lo) / range * 255.0).cast("int"))
        .otherwise(lit(0))
    })
    val xhat = transform(codes, (c, i) => {
      val lo = element_at(mn, i + 1)
      val range = element_at(mx, i + 1) - lo
      lo + (c.cast("double") + 0.5) * range / 255.0
    })
    val reconErr = aggregate(
      zip_with(e, xhat, (x, h) => (x - h) * (x - h)), lit(0.0), _ + _)
    df.select(col(idCol), col(embCol))
      .withColumn("codes", codes)
      .withColumn("recon_err", reconErr)
  }
}
