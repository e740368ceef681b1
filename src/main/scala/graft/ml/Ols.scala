package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-feature ordinary least squares with intercept, solved in closed
  * form from the normal equations by Cramer's rule — the multivariate
  * step up from the built-in `regr_slope`/`regr_intercept` pair (which
  * [[graft.SparkEntry]] exposes as q_regression for the 1-feature
  * case). Two features cover the workhorse audits — "does y track x1
  * once x2 is controlled for?" — without needing an iterative solver;
  * for wider designs use [[LogReg]]-style fixed-point GD.
  *
  * Scale shape: ONE corpus scan into a 1-row aggregate of the nine
  * sufficient statistics (n, Σx1, Σx2, Σx1², Σx2², Σx1x2, Σy, Σx1y,
  * Σx2y), all in DECIMAL(18,2)-products (exact for 2-decimal data, so
  * order-independent); the 3×3 Cramer solve and the R² identity
  * SSE = Σy² − b0Σy − b1Σx1y − b2Σx2y are scalar double arithmetic on
  * that single row. Nothing iterates, nothing is collected.
  */
object Ols {

  private[ml] def det3(a11: Column, a12: Column, a13: Column,
                       a21: Column, a22: Column, a23: Column,
                       a31: Column, a32: Column, a33: Column): Column =
    a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
      a13 * (a21 * a32 - a22 * a31)

  /** One output row: `n`, `b0` (intercept), `b1`, `b2`, `r2` (rounded
    * 6). Null coefficients when the design is singular (|det| = 0 —
    * e.g. a constant or perfectly collinear feature); `r2` null then
    * too, or when SST = 0 (constant target).
    */
  def ols2(df: DataFrame, x1Col: String, x2Col: String, yCol: String): DataFrame = {
    def d2(c: String) = col(c).cast("decimal(18,2)")
    val base = df.filter(col(x1Col).isNotNull && col(x2Col).isNotNull
        && col(yCol).isNotNull)
      .select(d2(x1Col).as("__x1"), d2(x2Col).as("__x2"), d2(yCol).as("__y"))
    val sums = base.agg(
      count(lit(1)).as("n"),
      sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
      sum(col("__x1") * col("__x1")).as("__s11"),
      sum(col("__x2") * col("__x2")).as("__s22"),
      sum(col("__x1") * col("__x2")).as("__s12"),
      sum(col("__y")).as("__sy"),
      sum(col("__x1") * col("__y")).as("__s1y"),
      sum(col("__x2") * col("__y")).as("__s2y"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    // A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]], rhs = (sy, s1y, s2y);
    // det3 spells the cofactor expansion identically in the SQL oracle
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    val det = det3(nD, dd("__s1"), dd("__s2"),
      dd("__s1"), dd("__s11"), dd("__s12"),
      dd("__s2"), dd("__s12"), dd("__s22"))
    val det0 = det3(dd("__sy"), dd("__s1"), dd("__s2"),
      dd("__s1y"), dd("__s11"), dd("__s12"),
      dd("__s2y"), dd("__s12"), dd("__s22"))
    val det1 = det3(nD, dd("__sy"), dd("__s2"),
      dd("__s1"), dd("__s1y"), dd("__s12"),
      dd("__s2"), dd("__s2y"), dd("__s22"))
    val det2 = det3(nD, dd("__s1"), dd("__sy"),
      dd("__s1"), dd("__s11"), dd("__s1y"),
      dd("__s2"), dd("__s12"), dd("__s2y"))
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sse = dd("__syy") - b0 * dd("__sy") - b1 * dd("__s1y") - b2 * dd("__s2y")
    val sst = dd("__syy") - dd("__sy") * dd("__sy") / nD
    val singular = det === 0.0
    sums.select(col("n"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b0 + lit(1e-12), 6)).as("b0"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b1 + lit(1e-12), 6)).as("b1"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b2 + lit(1e-12), 6)).as("b2"),
      when(singular || sst === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - sse / sst + lit(1e-12), 6)).as("r2"))
  }

  /** Ridge variant of [[ols2]]: the normal matrix gets +λ on the two
    * FEATURE diagonal entries (s11, s22 — the intercept is
    * conventionally unpenalized), shrinking coefficients toward 0 and
    * keeping collinear designs solvable (λ > 0 makes the matrix
    * positive definite whenever features aren't constant-zero). Same
    * one-aggregate dataflow and Cramer solve; `r2` reports the ridge
    * fit's residual against the same SST via SSE = Σy² − b·(Σy, Σx1y,
    * Σx2y) — valid because the SSE identity only needs the fitted b.
    *
    * One output row: `n`, `b0`, `b1`, `b2`, `r2` (rounded 6).
    */
  def ridge2(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
             lambda: Double): DataFrame = {
    require(lambda > 0, s"lambda must be > 0, got $lambda (use ols2 for 0)")
    def d2(c: String) = col(c).cast("decimal(18,2)")
    val base = df.filter(col(x1Col).isNotNull && col(x2Col).isNotNull
        && col(yCol).isNotNull)
      .select(d2(x1Col).as("__x1"), d2(x2Col).as("__x2"), d2(yCol).as("__y"))
    val sums = base.agg(
      count(lit(1)).as("n"),
      sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
      sum(col("__x1") * col("__x1")).as("__s11"),
      sum(col("__x2") * col("__x2")).as("__s22"),
      sum(col("__x1") * col("__x2")).as("__s12"),
      sum(col("__y")).as("__sy"),
      sum(col("__x1") * col("__y")).as("__s1y"),
      sum(col("__x2") * col("__y")).as("__s2y"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val (r11, r22) = (dd("__s11") + lambda, dd("__s22") + lambda)
    val det = det3(nD, dd("__s1"), dd("__s2"),
      dd("__s1"), r11, dd("__s12"), dd("__s2"), dd("__s12"), r22)
    val det0 = det3(dd("__sy"), dd("__s1"), dd("__s2"),
      dd("__s1y"), r11, dd("__s12"), dd("__s2y"), dd("__s12"), r22)
    val det1 = det3(nD, dd("__sy"), dd("__s2"),
      dd("__s1"), dd("__s1y"), dd("__s12"), dd("__s2"), dd("__s2y"), r22)
    val det2 = det3(nD, dd("__s1"), dd("__sy"),
      dd("__s1"), r11, dd("__s1y"), dd("__s2"), dd("__s12"), dd("__s2y"))
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sse = dd("__syy") - b0 * dd("__sy") - b1 * dd("__s1y") - b2 * dd("__s2y")
    val sst = dd("__syy") - dd("__sy") * dd("__sy") / nD
    val singular = det === 0.0
    sums.select(col("n"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b0 + lit(1e-12), 6)).as("b0"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b1 + lit(1e-12), 6)).as("b1"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b2 + lit(1e-12), 6)).as("b2"),
      when(singular || sst === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - sse / sst + lit(1e-12), 6)).as("r2"))
  }

  /** Per-group [[ols2]]: one grouped aggregate of the sufficient
    * statistics, then the Cramer solve per group row — k independent
    * regressions for the price of one scan (the fold trick of
    * [[CrossVal]] without the complement subtraction). Output: one
    * row per group with the [[ols2]] columns.
    */
  def ols2By(df: DataFrame, groupCols: Seq[String], x1Col: String,
             x2Col: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "use ols2 for the ungrouped fit")
    def d2(c: String) = col(c).cast("decimal(18,2)")
    val gcols = groupCols.map(col)
    val base = df.filter(col(x1Col).isNotNull && col(x2Col).isNotNull
        && col(yCol).isNotNull)
      .select(gcols :+ d2(x1Col).as("__x1") :+ d2(x2Col).as("__x2")
        :+ d2(yCol).as("__y"): _*)
    val sums = base.groupBy(gcols: _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x1")).as("__s1"), sum(col("__x2")).as("__s2"),
      sum(col("__x1") * col("__x1")).as("__s11"),
      sum(col("__x2") * col("__x2")).as("__s22"),
      sum(col("__x1") * col("__x2")).as("__s12"),
      sum(col("__y")).as("__sy"),
      sum(col("__x1") * col("__y")).as("__s1y"),
      sum(col("__x2") * col("__y")).as("__s2y"),
      sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("n").cast("double")
    def dd(c: String) = col(c).cast("double")
    val det = det3(nD, dd("__s1"), dd("__s2"),
      dd("__s1"), dd("__s11"), dd("__s12"), dd("__s2"), dd("__s12"), dd("__s22"))
    val det0 = det3(dd("__sy"), dd("__s1"), dd("__s2"),
      dd("__s1y"), dd("__s11"), dd("__s12"), dd("__s2y"), dd("__s12"), dd("__s22"))
    val det1 = det3(nD, dd("__sy"), dd("__s2"),
      dd("__s1"), dd("__s1y"), dd("__s12"), dd("__s2"), dd("__s2y"), dd("__s22"))
    val det2 = det3(nD, dd("__s1"), dd("__sy"),
      dd("__s1"), dd("__s11"), dd("__s1y"), dd("__s2"), dd("__s12"), dd("__s2y"))
    val (b0, b1, b2) = (det0 / det, det1 / det, det2 / det)
    val sse = dd("__syy") - b0 * dd("__sy") - b1 * dd("__s1y") - b2 * dd("__s2y")
    val sst = dd("__syy") - dd("__sy") * dd("__sy") / nD
    val singular = det === 0.0
    sums.select(gcols ++ Seq(col("n"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b0 + lit(1e-12), 6)).as("b0"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b1 + lit(1e-12), 6)).as("b1"),
      when(singular, lit(null).cast("double"))
        .otherwise(round(b2 + lit(1e-12), 6)).as("b2"),
      when(singular || sst === 0.0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - sse / sst + lit(1e-12), 6)).as("r2")): _*)
  }
}
