package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding vectors — the storage/serve
  * compression step of a vector index (each float becomes one byte;
  * a 100 TB float corpus serves from 25 TB).
  *
  * Per-vector min/max codebook: code_i = floor((x_i - min) / scale)
  * clamped to [0, 255] with scale = (max - min) / 255, reconstruction
  * x'_i = min + code_i * scale. floor (not round) on both engines —
  * round/cast tie-breaking differs between engines, floor does not.
  * Constant vectors (max == min) quantize to all-zero codes with
  * scale 0.
  *
  * Everything is per-row array arithmetic over a column-pruned scan —
  * no shuffle, no UDF; the whole report stays in one codegen'd
  * projection stage, so it runs at scan speed at any corpus size.
  */
object Quantize {

  private def minmaxScale(e: Column): (Column, Column) = {
    val lo = array_min(e)
    (lo, (array_max(e) - lo) / 255.0)
  }

  /** Quantization report: vector id, dims, codebook (lo, scale), the
    * code checksum (sum of int codes — pins the exact codes without
    * carrying the array), and the max absolute reconstruction error.
    * All doubles rounded to 6 decimals.
    */
  def report(df: DataFrame, embCol: String, idCol: String): DataFrame = {
    val e = col("__e")
    val (lo, scale) = minmaxScale(e)
    val codes = transform(e, x =>
      when(scale === 0.0, lit(0L)).otherwise(
        least(greatest(floor((x - lo) / scale), lit(0.0)), lit(255.0)).cast("long")))
    val recon = transform(codes, c => lo + c.cast("double") * scale)
    val maxErr = aggregate(zip_with(e, recon, (x, r) => abs(x - r)),
      lit(0.0), (acc, v) => greatest(acc, v))
    df.select(col(idCol), Similarity.toDouble(col(embCol)).as("__e"))
      .select(col(idCol),
        size(e).cast("long").as("n_dims"),
        round(lo, 6).as("lo"),
        round(scale, 6).as("scale"),
        aggregate(codes, lit(0L), _ + _).as("code_sum"),
        round(maxErr, 6).as("max_err"))
  }
}
