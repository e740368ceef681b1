package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a DETERMINISTIC,
  * hash-derived ±1 matrix (Achlioptas' database-friendly variant):
  * dim → k compression for downstream LSH/clustering when the full
  * embedding width is too wide to shuffle, with pairwise distances
  * preserved in expectation (E[Σ_c y_c²/k] = |x|²).
  *
  * The sign matrix is a pure integer formula — bit 16 of an LCG over
  * the flattened (c, j) index — so there is no RNG state, no seed
  * file, and the SQL oracle regenerates it inline; all arithmetic
  * stays below 2^40, inside exact BIGINT range on both engines.
  * Features quantize to the repo's 1e-6 long grid, so the k projected
  * coordinates are EXACT integers: the projection is bit-identical
  * across engines and partitionings by construction (each row is
  * independent — no aggregation across rows anywhere).
  *
  * Scale shape: the k×dim matrix ships as a plan literal; projection
  * is one zero-shuffle scan-stage map. The per-vector `jl_ratio`
  * column ((Σ y²/k)/|x|², ≈ 1 ± O(1/√k)) states the distortion as
  * data, the z-order-audit convention. All-zero vectors would divide
  * 0/0 in the ratio — callers filter empties first (the corpus
  * tables have none).
  */
object JlProject {

  /** ±1 from bit 16 of `1103515245·(c·dim+j) + 12345` — positive
    * everywhere, so `/` (Scala) and `//` (DuckDB) agree. */
  def signs(k: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(k, dim) { (c, j) =>
      1L - 2L * ((1103515245L * (c * dim + j) + 12345L) / 65536L % 2L)
    }

  /** One row per (id, projected coordinate): exact integer y_fp at the
    * 1e-6 input scale, plus the per-vector norm-preservation ratio. */
  def projectFp(df: DataFrame, embCol: String, idCol: String,
                k: Int, dim: Int): DataFrame = {
    require(k >= 1 && dim >= 1, s"k and dim must be >= 1, got k=$k dim=$dim")
    val litMat = typedLit(signs(k, dim).map(_.toSeq).toSeq)
    // the quantized feature array is bound ONCE as a projected column:
    // lambda bodies sit outside codegen subexpression elimination (the
    // round-8 trap), so referencing the transform() expression inside
    // the per-coordinate lambda re-quantized the full vector once per
    // projected coordinate (k+1 times per row). As an attribute it is
    // computed once; same arithmetic, bit-identical output.
    val xl = col("__xl")
    // per-coordinate dot products and the norms run through the codegen
    // fixed-point dot ([[graft.functions.LongDot]]; n2 = dot(xl, xl),
    // Σy² = dot(ys, ys)) — inside the litMat lambda LongDot evaluates
    // interpreted, but its body is still one primitive loop per
    // coordinate instead of a boxed per-element fold. Values and NULL
    // semantics identical.
    val base = df.select(col(idCol),
        transform(col(embCol),
          x => round(x.cast("double") * 1000000.0).cast("long")).as("__xl"))
      .select(col(idCol),
        transform(litMat, r =>
          graft.functions.LongDot.longDot(xl, r)).as("ys"),
        graft.functions.LongDot.longDot(xl, xl).as("n2"))
    val sy = graft.functions.LongDot.longDot(col("ys"), col("ys"))
    base.select(col(idCol),
        round((sy.cast("double") / lit(k.toDouble)) / col("n2").cast("double"), 6)
          .as("jl_ratio"),
        posexplode(col("ys")).as(Seq("c", "y_fp")))
      .select(col(idCol), col("c").cast("long").as("c"), col("y_fp"),
        col("jl_ratio"))
  }
}
