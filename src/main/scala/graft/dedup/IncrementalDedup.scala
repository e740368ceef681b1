package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Incremental corpus dedup against a persisted signature index —
  * the 100 TB operating mode. A production corpus is not deduped by
  * re-running the full O(corpus) pipeline on every ingest; new batches
  * are checked against an INDEX of everything already seen, and only
  * the batch's own signatures are computed and appended. Per-batch
  * cost is O(batch + matching index buckets), never O(corpus²) and
  * never a full-corpus recompute.
  *
  * The index is a [[graft.sources.VersionedTable]] (atomic commits,
  * time travel, idempotent re-ingest via `(txnApp, txn)`), one row per
  * indexed document:
  *
  *   `id: long, sz: long, sh: array<string>, prefix: array<string>,
  *    batch: long`
  *
  * `sh` is the distinct word n-gram set ([[Dedup.shingles]], the same
  * construction every dedup family here uses); `prefix` is the AllPairs
  * prefix (Bayardo et al. 2007): the first `|s| − ⌈t·|s|⌉ + 1` shingles
  * of the set under a FIXED global order. [[Dedup.jaccardJoinExact]]
  * orders by corpus document frequency — the best-performing order, but
  * one that changes as the corpus grows, which would force an O(index)
  * prefix recompute on every batch. Here the order is `(xxhash64(g),
  * g)`: content-determined, identical across batches and JVMs, so an
  * index row is written ONCE and never touched again. The prefix-filter
  * theorem needs only a consistent total order on tokens — any order is
  * complete; rarity order is purely a bucket-size heuristic — so
  * cross-batch candidate generation stays exact: if J(a, b) ≥ t, both
  * prefixes contain the pair's order-minimal shared shingle, and the
  * equi-join on prefix tokens cannot miss the pair.
  *
  * Batch semantics (deterministic, order-independent within a batch):
  *   - `dup_of_index`    — the doc has exact Jaccard ≥ t with ANY
  *                         previously indexed doc (kept or not: the
  *                         index records everything seen, so detection
  *                         does not depend on earlier keep choices).
  *   - `kept`            — not `dup_of_index`, and the doc is the
  *                         min-id member of its within-batch duplicate
  *                         cluster (connected components over exact
  *                         Jaccard ≥ t pairs, [[Dedup.clustersStar]]).
  *   - `dup_within_batch`— everything else.
  * `dup_of_index` takes precedence over cluster-min, so a replayed doc
  * never displaces its batch-mates' statuses.
  *
  * Scale shape: the batch side shuffles O(batch prefix tokens); the
  * index side is a parquet scan of `(id, sz, prefix)` only (column
  * pruning drops the full `sh` sets until the candidate-verify join,
  * which is candidate-sized). At 100 TB the index table is additionally
  * bucketed by `xxhash64(prefix token)` so the candidate join co-locates
  * without shuffling the index — see SCALING.md; the VersionedTable
  * layout here keeps doc-level rows and documents that path.
  */
object IncrementalDedup {

  /** Shingle sets + fixed-hash-order AllPairs prefix for one batch.
    * Output: `id, sz, sh, prefix`.
    */
  def indexRows(df: DataFrame, textCol: String, idCol: String,
                threshold: Double, n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    graft.operators.Ids.requireIntegral(df, idCol)
    val sh = Dedup.shingles(lower(col(textCol)), n)
    // total order (xxhash64(g), g): hash for spread, lexicographic
    // tiebreak so equal-hash collisions stay deterministic
    val sorted = array_sort(sh, (l, r) =>
      when(xxhash64(l) < xxhash64(r), -1).when(xxhash64(l) > xxhash64(r), 1)
        .when(l < r, -1).when(l > r, 1).otherwise(0))
    df.select(col(idCol).cast("long").as("id"), sorted.as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .withColumn("prefix", slice(col("sh"), lit(1),
        greatest(lit(1),
          (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))))
      // cast pins containsNull=true so computed rows and parquet-read
      // index rows carry ONE schema (the append schema-on-write check
      // compares exact DataTypes)
      .select(col("id"), col("sz"), col("sh").cast("array<string>").as("sh"),
        col("prefix").cast("array<string>").as("prefix"))
  }

  /** Exact cross-set similarity join: all (new, indexed) pairs with
    * Jaccard ≥ t. Candidates from the shared-prefix equi-join (complete
    * by the prefix-filter theorem — both sides' prefixes were cut under
    * the same fixed order), pruned by the size-ratio bound
    * (J ≥ t ⇒ t·|a| ≤ |b| ≤ |a|/t), verified on the full sets
    * candidate-pairs-only. Output: `id_new, id_old, jaccard`.
    */
  def crossPairs(newRows: DataFrame, indexRows: DataFrame,
                 threshold: Double): DataFrame = {
    val bTok = newRows.select(col("id").as("id_new"), col("sz").as("sz_new"),
      explode(col("prefix")).as("g"))
    val iTok = indexRows.select(col("id").as("id_old"), col("sz").as("sz_old"),
      explode(col("prefix")).as("g"))
    val cand = bTok.join(iTok, Seq("g"))
      .filter(col("sz_old").cast("double") >= lit(threshold) * col("sz_new")
        && col("sz_new").cast("double") >= lit(threshold) * col("sz_old"))
      .select(col("id_new"), col("id_old")).distinct()
    cand
      .join(newRows.select(col("id").as("id_new"), col("sh").as("sh_a")), Seq("id_new"))
      .join(indexRows.select(col("id").as("id_old"), col("sh").as("sh_b")), Seq("id_old"))
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("__u", size(col("sh_a")) + size(col("sh_b")) - col("__i"))
      .filter(col("__i").cast("double") >= lit(threshold) * col("__u").cast("double"))
      .select(col("id_new"), col("id_old"),
        round(col("__i").cast("double") / col("__u"), 6).as("jaccard"))
  }

  /** Ingest one batch: status every doc against the index-so-far and
    * the batch itself, then append the batch's signature rows to the
    * index atomically. Returns `id, batch, status` with status in
    * {kept, dup_within_batch, dup_of_index}.
    *
    * The index is read at a version PINNED before the append, so the
    * returned frame is safe to evaluate lazily after later batches have
    * committed. Pass `(txnApp, txn)` from a restartable ingest job to
    * make the append idempotent: a replayed batch re-reports statuses
    * (pure) but the index gains no second copy.
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   textCol: String, idCol: String, indexTable: String,
                   threshold: Double, batchId: Long, n: Int = 3,
                   txnApp: Option[String] = None,
                   txn: Option[Long] = None): DataFrame = {
    val rows = indexRows(batch, textCol, idCol, threshold, n).localCheckpoint()

    // within-batch duplicate clusters over exact pairs; the self-join
    // uses the rarity-order prefix (smaller buckets) — order choice is
    // per-run there, nothing is persisted from it
    val within = Dedup.jaccardJoinExact(batch, textCol, idCol, threshold, n)
    val comp = Dedup.clustersStar(rows.select(col("id")), within,
      "id", "id_a", "id_b")

    // Replay detection (the streamingCommitSink rule): this app's
    // highest committed txn covers ours → the append already happened.
    // txnMaxes is an O(checkpoint-tail) lookup; the full history walk
    // to locate the exact prior commit runs only on an actual replay.
    val replayed = txnApp.zip(txn).exists { case (app, t) =>
      VersionedTable.txnMaxes(indexTable).get(app).exists(_ >= t)
    }
    val replayedAt: Option[Long] =
      if (!replayed) None
      else txnApp.zip(txn).flatMap { case (app, t) =>
        VersionedTable.history(indexTable)
          .find(c => c.txnApp.contains(app) && c.txn.contains(t))
          .map(_.version)
      }

    // the index BEFORE this batch, pinned by version (-1 = empty); on
    // replay, pinned BELOW the original commit so statuses are pure —
    // a replayed doc never matches its own (or a batch-mate's) index
    // row. (If vacuum has since dropped the original entry, the append
    // is still skipped and statuses fall back to the latest snapshot.)
    val ver = replayedAt.map(_ - 1)
      .getOrElse(VersionedTable.latestVersion(indexTable))
    val dupIdx =
      if (ver < 0) rows.select(col("id").as("id_new")).limit(0)
      else crossPairs(rows,
        VersionedTable.readVersion(spark, indexTable, ver)
          .select(col("id"), col("sz"), col("sh"), col("prefix")),
        threshold).select(col("id_new")).distinct()

    if (!replayed)
      VersionedTable.commit(rows.withColumn("batch", lit(batchId)),
        indexTable, "append", txn, txnApp, expectedVersion = None)

    val dup = dupIdx.withColumn("__dup", lit(true))
    comp.join(dup, comp("id") === dup("id_new"), "left")
      .select(comp("id"), lit(batchId).as("batch"),
        when(col("__dup"), lit("dup_of_index"))
          .when(comp("id") === col("cluster"), lit("kept"))
          .otherwise(lit("dup_within_batch")).as("status"))
  }
}
