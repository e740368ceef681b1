package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capped sub-bucketing for pair-generating self-joins.
  *
  * Every bucket-local candidate generator (LSH band buckets, simhash
  * piece buckets, cosine label buckets) has the same degenerate case: one
  * oversized bucket — boilerplate docs sharing a band, a catch-all
  * cluster label — would emit m²/2 join pairs at corpus scale. Dropping
  * such buckets bounds memory but silently loses ALL their recall on
  * exactly the skewed data a 100 TB corpus has.
  *
  * This helper instead splits an oversized bucket into rank-contiguous
  * sub-buckets of at most `cap` rows (rank = row_number by the id within
  * the bucket), emitted as pass 0, plus a second "stitching" pass whose
  * chunk boundaries are offset by cap/2. Pairing then happens within a
  * (bucket, pass, sub) group:
  *
  *   - per-group size ≤ cap by construction in BOTH passes, so join
  *     fan-out and aggregation buffers stay bounded: total pair work per
  *     bucket is ≤ 2·(m/cap)·cap²/2 = m·cap — LINEAR in the bucket, not
  *     quadratic;
  *   - any pair whose members sit within rank distance < cap/2 of each
  *     other is guaranteed to share a chunk in at least one pass (a pair
  *     straddling a pass-0 boundary at k·cap with distance < cap/2 has
  *     both ends inside the pass-1 chunk [k·cap − cap/2, k·cap + cap/2));
  *   - a pair is emitted by EXACTLY one pass when the caller filters
  *     pass-1 pairs to those whose pass-0 sub-buckets differ
  *     (`__pass = 0 OR __sub0_a ≠ __sub0_b`) — no dedup shuffle needed;
  *   - buckets already ≤ cap get the single membership (0, 0, 0), so the
  *     join keys collapse to the bucket key and results are bit-identical
  *     to the uncapped formulation — the healthy path pays nothing.
  *
  * So skew degrades to bounded extra work with a documented recall floor
  * (pairs within cap/2 of each other in id-rank order) instead of
  * silently dropped pairs. The membership is deterministic (rank by id),
  * which keeps it exactly reproducible in the SQL oracle via the same
  * `row_number() − 1` arithmetic.
  *
  * Plan shape: row_number and the bucket-size count share ONE window
  * partitioning (the count uses the unbounded frame of the same ordered
  * spec — a single Exchange + Sort + WindowExec), and that hash
  * partitioning on the bucket keys satisfies any downstream groupBy/join
  * whose keys extend (bucket, pass, sub) — partitioning exprs ⊆
  * clustering keys — so adding sub-buckets adds ZERO exchanges over the
  * old drop-the-bucket formulation.
  */
object SubBuckets {

  /** Explodes each row into its sub-bucket memberships, appending
    * `__pass` (int: 0 = base chunks, 1 = half-offset stitching chunks),
    * `__sub` (long chunk index within the pass) and `__sub0` (long
    * pass-0 chunk index, for the exactly-once pair filter). Rows in
    * buckets of size ≤ cap appear once with (0, 0, 0); rows in oversized
    * buckets appear twice (once per pass).
    */
  def withMembership(df: DataFrame, bucketCols: Seq[Column], ordCol: Column,
                     cap: Int): DataFrame = {
    require(cap >= 2, s"sub-bucket cap must be >= 2 (got $cap)")
    val half = cap / 2
    val w = Window.partitionBy(bucketCols: _*).orderBy(ordCol)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rn = row_number().over(w).cast("long") - 1
    val bsz = count(lit(1)).over(wAll)
    val sub0 = floor(col("__rn") / cap).cast("long")
    val sub1 = floor((col("__rn") + half) / cap).cast("long")
    val p0 = struct(lit(0).as("pass"), sub0.as("sub"), sub0.as("sub0"))
    val p1 = struct(lit(1).as("pass"), sub1.as("sub"), sub0.as("sub0"))
    df.withColumn("__rn", rn)
      .withColumn("__bsz", bsz)
      .withColumn("__m",
        explode(when(col("__bsz") <= cap, array(p0)).otherwise(array(p0, p1))))
      .withColumn("__pass", col("__m.pass"))
      .withColumn("__sub", col("__m.sub"))
      .withColumn("__sub0", col("__m.sub0"))
      .drop("__m", "__rn", "__bsz")
  }

  /** The exactly-once condition for a pair join over memberships: pass-0
    * pairs always qualify; pass-1 (stitching) pairs only when the two
    * sides came from DIFFERENT pass-0 chunks (a pair sharing a pass-0
    * chunk was already emitted there).
    */
  def exactlyOnce(pass: Column, sub0A: Column, sub0B: Column): Column =
    pass === 0 || sub0A =!= sub0B
}
