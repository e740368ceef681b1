package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Join-cardinality estimation from bucketed key histograms — the
  * Count-Min / AMS inner-product estimator (Alon-Matias-Szegedy 1996;
  * Cormode-Muthukrishnan 2005): |A ⋈ B| on key k equals
  * Σ_k cntA(k)·cntB(k), and hashing keys into `width` buckets gives
  * Σ_b cA[b]·cB[b] ≥ truth (collisions only ADD cross terms), with
  * E[overshoot] ≤ |A|·|B| / width per hash row. `depth` independent
  * rows (salted hashes) and a min over rows tighten the tail. With
  * A = B this is the second frequency moment F₂ — the self-join-size
  * estimate query optimizers use for skew detection.
  *
  * Scale shape: each side collapses to ≤ depth·width histogram rows
  * map-side before one tiny exchange; the histogram join and the final
  * per-row sum touch sketch-sized data only. The corpus is scanned
  * once per side and nothing key-cardinality-sized ever reaches the
  * driver. Hashing is [[PolyHash]] over "row:key" — deterministic and
  * dialect-portable, so an external engine can replay the estimate
  * bit-for-bit rather than trusting a bound.
  */
object JoinSize {

  /** One estimate row per hash row r ∈ [0, depth): `r`, `est`.
    * min(est) over rows is the estimator; keeping rows separate lets
    * callers see the per-row spread (and an oracle check each). */
  def cmInnerProduct(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
                     width: Int = 1024, depth: Int = 3): DataFrame = {
    require(width > 0 && depth >= 1, s"bad sketch dims $width x $depth")
    Ids.requireIntegral(a, keyA, "join key"); Ids.requireIntegral(b, keyB, "join key")
    def hist(df: DataFrame, key: String, cName: String): DataFrame =
      df.select(col(key).cast("long").as("k"))
        .select(col("k"), explode(sequence(lit(0L), lit(depth - 1L))).as("r"))
        .select(col("r"), bucketOf(col("r"), col("k"), width).as("bucket"))
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as(cName))
    hist(a, keyA, "ca").join(hist(b, keyB, "cb"), Seq("r", "bucket"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("est"))
  }

  /** Salted bucket hash: PolyHash("r:k") mod width. */
  def bucketOf(r: Column, k: Column, width: Int): Column =
    PolyHash.polyHash(
      concat(r.cast("string"), lit(":"), k.cast("string"))) % lit(width.toLong)
}
