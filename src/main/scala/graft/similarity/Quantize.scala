package graft.similarity

import org.apache.spark.sql.DataFrame
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

  /** Quantization report: vector id, dims, codebook (lo, scale), the
    * code checksum (sum of int codes — pins the exact codes without
    * carrying the array), and the max absolute reconstruction error.
    * All doubles rounded to 6 decimals.
    */
  def report(df: DataFrame, embCol: String, idCol: String): DataFrame = {
    // The codebook (lo, scale) and the code array are bound as PROJECTED
    // COLUMNS before any lambda references them: codegen subexpression
    // elimination does not reach LambdaFunction bodies (the round-8
    // n-gram trap), so the original single-projection form re-evaluated
    // array_min/array_max per ELEMENT inside the codes/recon lambdas —
    // O(dim²) per row. Bound as attributes they are computed once per
    // row, and CollapseProject keeps the stages separate (each bound
    // expression is non-cheap and referenced more than once). The
    // arithmetic is unchanged expression for expression, so the report
    // is bit-identical.
    val e = col("__e")
    val lo = col("__lo"); val scale = col("__scale"); val codes = col("__codes")
    df.select(col(idCol), Similarity.toDouble(col(embCol)).as("__e"))
      .select(col(idCol), e, array_min(e).as("__lo"), array_max(e).as("__hi"))
      .select(col(idCol), e, lo, ((col("__hi") - lo) / 255.0).as("__scale"))
      .select(col(idCol), e, lo, scale,
        transform(e, x =>
          when(scale === 0.0, lit(0L)).otherwise(
            least(greatest(floor((x - lo) / scale), lit(0.0)), lit(255.0))
              .cast("long"))).as("__codes"))
      .select(col(idCol),
        size(e).cast("long").as("n_dims"),
        round(lo, 6).as("lo"),
        round(scale, 6).as("scale"),
        aggregate(codes, lit(0L), _ + _).as("code_sum"),
        round(aggregate(
          zip_with(e, transform(codes, c => lo + c.cast("double") * scale),
            (x, r) => abs(x - r)),
          lit(0.0), (acc, v) => greatest(acc, v)), 6).as("max_err"))
  }
}
