package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): hash every k-gram, slide a window of `w`
  * consecutive hashes, keep each window's minimum. The selected
  * fingerprints are position-robust (any shared run of ≥ w+k−1 tokens
  * between two documents is GUARANTEED to share at least one
  * fingerprint) while storing only ~2/(w+1) of the hashes — the
  * classic middle ground between exact shingle sets (complete, huge)
  * and MinHash (compact, probabilistic).
  *
  * Scale shape: fingerprint selection is pure scan-stage array
  * arithmetic (split → k-gram hash → windowed min → distinct), no
  * shuffle until the per-doc fingerprint rows; candidate pairing is the
  * bucket-join discipline of [[Dedup.minhashCandidates]] — pairs form
  * only inside one fingerprint's bucket, and buckets above `maxBucket`
  * (boilerplate shared by everything) are dropped loudly rather than
  * joined quadratically.
  */
object Winnow {

  /** The md5-prefix 52-bit hash used for gram hashing — the engine-
    * portable integer hash idiom (13 hex digits fold exactly into a
    * long in any engine).
    */
  private def hash52(s: Column): Column =
    conv(substring(md5(s), 1, 13), 16, 10).cast("long")

  /** One row per (doc, fingerprint): `id`, `fp`. Documents shorter than
    * k tokens produce none; documents with fewer than `w` k-grams keep
    * the single global minimum (the standard short-document rule).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val toks = split(lower(col(textCol)), " ")
    df.select(col(idCol).cast("long").as("id"), toks.as("__tk"))
      .withColumn("__hs",
        when(size(col("__tk")) >= k,
          transform(sequence(lit(0), size(col("__tk")) - k),
            i => hash52(concat_ws(" ", slice(col("__tk"), i + 1, lit(k))))))
        .otherwise(array().cast("array<bigint>")))
      .withColumn("__ms",
        when(size(col("__hs")) >= w,
          transform(sequence(lit(0), size(col("__hs")) - w),
            j => array_min(slice(col("__hs"), j + 1, lit(w)))))
        .otherwise(when(size(col("__hs")) > 0, array(array_min(col("__hs"))))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("id"), explode(array_distinct(col("__ms"))).as("fp"))
  }

  /** Candidate near-duplicate pairs: documents sharing at least
    * `minShared` fingerprints. Fingerprint buckets above `maxBucket`
    * are excluded (the cap shares the groupBy exchange via a window
    * count, exactly like the minhash band cap); downstream exact
    * verification (`Dedup.jaccardOnPairs`) stays cheap because shared
    * fingerprints already imply shared ≥ w+k−1-token runs.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, w: Int = 4, minShared: Int = 2,
                     maxBucket: Int = 200): DataFrame = {
    val fp = fingerprints(df, idCol, textCol, k, w)
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("__bn") <= maxBucket)
    fp.select(col("fp"), col("id").as("id_a"))
      .join(fp.select(col("fp"), col("id").as("id_b")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
