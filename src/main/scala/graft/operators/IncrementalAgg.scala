package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic incremental view maintenance for sum/count-shaped
  * aggregates: fold a signed change set (inserts +1, deletes −1) into a
  * materialized per-group aggregate WITHOUT rescanning the base table.
  *
  * The 100 TB motivation: a materialized rollup over a petabyte fact
  * table must not be recomputed because one partition changed. Sums and
  * counts form an abelian group — a delete is the insert's inverse — so
  * the maintained state is `base ⊕ Σ(sign · contribution(change))`, an
  * aggregate over the CHANGE SET only (typically millions of rows, not
  * billions) followed by a group-key union-merge with the existing
  * state. Cost scales with |changes| + |affected groups|, never with the
  * base.
  *
  * Groups whose maintained count reaches 0 are dropped (the group no
  * longer exists in the underlying multiset); a negative count means the
  * change stream deleted rows that were never inserted — that is data
  * corruption, surfaced loudly via assert rather than clamped.
  *
  * Avg/stddev/corr derive from maintained (n, Σx, Σx²...) — see
  * qStatsMoments for the moment-sum pattern this composes with. Min/max
  * are NOT incrementally maintainable under deletes (a deleted max needs
  * a rescan to find the runner-up) and are deliberately absent.
  */
object IncrementalAgg {

  /** Update `baseAgg` — one row per group with columns `cntCol` and the
    * sums in `sumCols` — by the signed rows of `changes` (same group
    * columns; `signCol` = +1 insert / −1 delete; measure columns named as
    * in `sumCols`' values).
    *
    * @param sumCols maintained sum columns: maintainedName -> change-side
    *                measure column (summed as exact decimal(18,2) like
    *                every money sum in this repo, then cast back double)
    */
  def applySigned(baseAgg: DataFrame, changes: DataFrame, groupCols: Seq[String],
                  cntCol: String, sumCols: Seq[(String, String)],
                  signCol: String): DataFrame = {
    val gcols = groupCols.map(col)
    val sgn = col(signCol).cast("long")
    // change-set contribution: one aggregate over the delta only
    val delta = changes
      .groupBy(gcols: _*)
      .agg(sum(sgn).as(cntCol),
        sumCols.map { case (out, m) =>
          sum(col(m).cast("decimal(18,2)") * sgn).cast("double").as(out)
        }: _*)
    // group-key merge: sums add, absent side contributes zero
    val merged = baseAgg.select(gcols :+ col(cntCol)
        :+ struct(sumCols.map { case (out, _) => col(out) }: _*).as("__s"): _*)
      .unionByName(delta.select(gcols :+ col(cntCol)
        :+ struct(sumCols.map { case (out, _) => col(out) }: _*).as("__s"): _*))
      .groupBy(gcols: _*)
      .agg(sum(col(cntCol)).as(cntCol),
        sumCols.map { case (out, _) =>
          sum(col("__s").getField(out).cast("decimal(18,2)")).cast("double").as(out)
        }: _*)
    merged
      .filter(assert_true(col(cntCol) >= 0,
        lit("IncrementalAgg: maintained count went negative — the change " +
          "stream deleted rows never present in the base")).isNull)
      .filter(col(cntCol) > 0)
  }

  /** Convenience: build the base aggregate in the maintained shape. */
  def materialize(df: DataFrame, groupCols: Seq[String], cntCol: String,
                  sumCols: Seq[(String, String)]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(cntCol),
        sumCols.map { case (out, m) =>
          sum(col(m).cast("decimal(18,2)")).cast("double").as(out)
        }: _*)
}
