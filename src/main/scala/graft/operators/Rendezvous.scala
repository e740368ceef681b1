package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing: assign each key to the
  * shard whose hash(key, shard) is largest. The property modulo
  * hashing lacks: when a shard is added or removed, ONLY the keys whose
  * winner changed move (≈ 1/(N+1) of them) — `pmod(hash(key), N)`
  * reshuffles nearly everything on N→N+1, which at 100 TB means
  * rewriting the lake to grow a bucketed layout. HRW is how an
  * incremental pipeline keeps shard-local state (dedup keep-lists,
  * per-shard indexes) stable across capacity changes.
  *
  * Scan-stage only: the shard list is a plan literal, the score per
  * (key, shard) is the md5 HEX STRING of "key#shard" — ranked as a
  * string, which every engine orders identically, the same portability
  * idiom as the hash-rank samplers in [[Sampling]] — and the winner is
  * one `array_max` over lexicographic (score, −index) structs (ties,
  * were md5 ever to collide, break to the earlier shard in the list).
  * Zero Exchange at any corpus size.
  *
  * The hash choice is load-bearing: a rolling polynomial hash
  * (PolyHash) of "key#shard" strings is near-MONOTONE in the trailing
  * shard characters, so its scores rank shards almost identically for
  * every key — one shard wins nearly everything, and even a mod-M
  * squaring finalizer leaves ~40% churn on a grow (measured). An
  * avalanching digest restores the ~1/(N+1) movement HRW promises.
  */
object Rendezvous {

  /** Appends `outCol` = the winning shard name for `keyCol`. */
  def assign(df: DataFrame, keyCol: String, shards: Seq[String],
             outCol: String = "shard"): DataFrame =
    df.withColumn(outCol, shardFor(col(keyCol), shards))

  /** The winning shard as a Column expression (composable in-plan). */
  def shardFor(key: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty, "shards must be non-empty")
    require(shards.distinct.length == shards.length,
      s"duplicate shard names: $shards")
    val names = array(shards.map(lit): _*)
    val scored = transform(names, (s, i) => struct(
      md5(concat(key.cast("string"), lit("#"), s)).as("h"),
      (-i).cast("long").as("ni"), s.as("s")))
    array_max(scored).getField("s")
  }
}
