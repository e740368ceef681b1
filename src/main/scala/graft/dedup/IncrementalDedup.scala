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
  *   `id: long, sz: long, sh: array<string>, shh: array<bigint>,
  *    prefix: array<string>, batch: long`
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
  * which is candidate-sized). Hot-token detection never rescans the
  * index: a per-token count table ([[tokenFreqTable]]) is maintained
  * beside it as algebraic partials — +O(batch) per ingest, compacted
  * periodically — so ingest N+1 never recomputes ingest N anywhere in
  * the pipeline. At 100 TB the index table is additionally
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
    // tiebreak so equal-hash collisions stay deterministic. Sorting
    // (hash, gram) STRUCTS under their natural order hashes each gram
    // once; a comparator lambda would re-evaluate xxhash64 at every
    // comparison (O(m log m) string hashes per doc). The hash half of
    // the sort key is kept as `shh` — the verify stage's cheap filter
    // (long-array intersect ~4× faster than string-array intersect;
    // measured in SCALING.md).
    val sorted = array_sort(transform(sh,
      g => struct(xxhash64(g).as("h"), g.as("g"))))
    df.select(col(idCol).cast("long").as("id"), sorted.as("__hs"))
      .select(col("id"), transform(col("__hs"), s => s.getField("g")).as("sh"),
        transform(col("__hs"), s => s.getField("h")).as("shh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .withColumn("prefix", slice(col("sh"), lit(1),
        greatest(lit(1),
          (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))))
      // casts pin containsNull=true so computed rows and parquet-read
      // index rows carry ONE schema (the append schema-on-write check
      // compares exact DataTypes)
      .select(col("id"), col("sz"), col("sh").cast("array<string>").as("sh"),
        col("shh").cast("array<bigint>").as("shh"),
        col("prefix").cast("array<string>").as("prefix"))
  }

  /** ONE candidate+verify pass for a batch: every exact-Jaccard ≥ t
    * pair of (batch doc, batch doc) — tagged `within = true`, emitted
    * once with `id_new < id_old` — and of (batch doc, indexed doc) —
    * `within = false`. Fusing the self-join and the index join into a
    * single shared-prefix equi-join halves the number of shuffle
    * chains an ingest runs (measured: the split pipelines dominated
    * the batch wall-time, SCALING.md).
    *
    * Candidates come from the shared-prefix equi-join (complete by the
    * prefix-filter theorem — all prefixes were cut under the same fixed
    * order), pruned by the size-ratio bound (J ≥ t ⇒ t·|a| ≤ |b| ≤
    * |a|/t). Verification is filter-then-refine: the long-array hash
    * intersect (~4× cheaper than string intersect) computes a
    * hash-Jaccard that can only OVERestimate (collisions merge
    * elements, and the union term uses the true string-set sizes), so
    * `hashJ ≥ t` is a complete filter; the string intersect then
    * confirms the few survivors — exactness never rides on hash
    * collisionlessness. Output: `id_new, id_old, within, jaccard`.
    *
    * Zipf-hot prefix tokens (side frequency > [[DefaultHotTokenCap]])
    * are routed through an exact size-banded chunk grid instead of the
    * plain equi-join bucket — bounded per-task pair work with zero
    * recall loss (see the 5-arg overload's body).
    */
  def batchPairs(rows: DataFrame, index: Option[DataFrame],
                 threshold: Double): DataFrame =
    batchPairs(rows, index, threshold,
      hotTokenCap = DefaultHotTokenCap, hotChunk = DefaultHotChunk)

  /** A prefix token is HOT when either side of the candidate join holds
    * more than this many rows for it — a Zipf-head shingle landing in
    * millions of prefixes would otherwise make the equi-join's one
    * bucket quadratic in that token's frequency (the batch path's
    * [[Dedup.jaccardJoinExact]] dodges the same bucket with DF-rarity
    * prefix ordering, which the incremental index gave up for
    * write-once rows). Hot tokens route through the exact size-banded
    * chunk grid instead; cold tokens pay nothing.
    */
  val DefaultHotTokenCap = 1024

  /** Rank-chunk size for the hot-token grid: each side of a hot token's
    * bucket is split into size-ordered chunks of at most this many
    * rows, so every join group is ≤ chunk² pair evaluations with a
    * chunk-bounded build side — no task ever owns a whole hot bucket.
    */
  val DefaultHotChunk = 1024

  /** Hot tokens are materialized to the driver when there are at most
    * this many (a bounded, stated collect: ≤ 64 B/shingle ⇒ ≤ 1 MB) —
    * an empty set short-circuits to the plain single-join plan and a
    * small set becomes codegen'd `isin` literals, so the common corpus
    * pays only the two frequency counts. Beyond the bound (an
    * adversarial corpus where MILLIONS of tokens exceed the cap) the
    * split stays fully lazy via broadcast anti/semi joins.
    */
  val DefaultMaxHotCollect = 16384

  def batchPairs(rows: DataFrame, index: Option[DataFrame], threshold: Double,
                 hotTokenCap: Int, hotChunk: Int): DataFrame =
    batchPairs(rows, index, threshold, hotTokenCap, hotChunk,
      DefaultMaxHotCollect)

  def batchPairs(rows: DataFrame, index: Option[DataFrame], threshold: Double,
                 hotTokenCap: Int, hotChunk: Int, maxHotCollect: Int): DataFrame =
    batchPairs(rows, index, threshold, hotTokenCap, hotChunk, maxHotCollect,
      indexTokenCounts = None)

  def batchPairs(rows: DataFrame, index: Option[DataFrame], threshold: Double,
                 hotTokenCap: Int, hotChunk: Int, maxHotCollect: Int,
                 indexTokenCounts: Option[DataFrame]): DataFrame =
    batchPairs(rows, index, threshold, hotTokenCap, hotChunk, maxHotCollect,
      indexTokenCounts, HotInputs())

  /** Precomputed hot-detection inputs an ingest loop already has in
    * hand — every field steers PERFORMANCE only (the hot set is a pure
    * routing split; see [[batchPairs]]), so a wrong value can never
    * drop or invent a pair:
    *
    *   - `batchFreq`: this batch's per-prefix-token counts (`g, cnt` —
    *     [[batchTokenCounts]] of `rows`). Supplying a checkpointed
    *     frame lets hot detection reuse it instead of re-exploding the
    *     batch. MUST equal `batchTokenCounts(rows)` — it is the same
    *     quantity, precomputed.
    *   - `batchMaxFreq`: `max(cnt)` over `batchFreq` (0 for an empty
    *     batch).
    *   - `indexMaxCnt`: an upper bound on the index side's largest
    *     per-token count ([[readMaxCntHint]]; exact after
    *     [[compactTokenFreq]]). An UNDER-estimate only risks leaving a
    *     genuinely hot token in the exact-but-quadratic equi-join
    *     bucket — the pre-hot-split plan, never a wrong answer.
    *
    * When `batchMaxFreq + indexMaxCnt ≤ hotTokenCap` (both present; a
    * batch-only self-join needs just `batchMaxFreq ≤ cap`), NO token
    * can be hot — every join-side frequency is bounded by that sum —
    * so [[batchPairs]] emits the plain single-join plan with ZERO
    * eager jobs: no count aggregation, no index read, no collect. This
    * is the common-corpus ingest fast path (hash-ordered prefixes have
    * no natural stop-shingles; hot tokens are the adversarial tail).
    */
  final case class HotInputs(batchFreq: Option[DataFrame] = None,
                             batchMaxFreq: Option[Long] = None,
                             indexMaxCnt: Option[Long] = None)

  /** Full-control overload. `indexTokenCounts` (`g: string, cnt: long`,
    * one row per distinct prefix token of `index`) lets hot-token
    * detection skip the full pass over the index prefix stream: the
    * rhs frequency of a token is `f_batch + cnt`, read from the
    * maintained table ([[processBatch]] keeps one next to the index,
    * [[tokenFreqTable]]). The counts steer PERFORMANCE only — the hot
    * set is a pure routing split, every membership is exact — so a
    * stale or approximate table can never drop a pair: over-counts
    * route more tokens through the (exact) grid, under-counts leave a
    * hot token in the (exact) equi-join bucket. Only the provided
    * `index` frame is ever joined for candidates.
    *
    * NOTE an eager job: hot detection runs `collect()` at PLAN-BUILD
    * time (bounded ≤ maxHotCollect+1 rows), so `rows` — and `index` if
    * no counts are supplied — are evaluated once here and again by the
    * returned plan. They must be DETERMINISTIC between those
    * evaluations (a parquet/VersionedTable read, or cached/
    * localCheckpoint()ed frames — [[processBatch]] checkpoints its
    * rows); a nondeterministic input could otherwise diverge between
    * the hot set and the data the cold/hot jobs later see, silently
    * mis-routing tokens.
    */
  def batchPairs(rows: DataFrame, index: Option[DataFrame], threshold: Double,
                 hotTokenCap: Int, hotChunk: Int, maxHotCollect: Int,
                 indexTokenCounts: Option[DataFrame],
                 hotInputs: HotInputs): DataFrame =
    pairsImpl(rows,
      index.map { idx =>
        IndexSide(
          tok = idx.select(col("id").as("id_old"), col("sz").as("sz_old"),
            posexplode(col("prefix")).as(Seq("po", "g"))),
          payload = idx.select(col("id"), col("sh"), col("shh")))
      },
      threshold, hotTokenCap, hotChunk, maxHotCollect, indexTokenCounts,
      hotInputs)

  /** The index side of [[pairsImpl]], decoupled from the doc-level frame
    * shape so the ingest path can swap in the PERSISTED posting-list
    * layout: `tok` is the already-exploded prefix-token stream
    * (`id_old, sz_old, po, g`) — a posexplode of doc rows for the
    * generic API, or a bucket-pruned read of the postings table for
    * ingest — and `payload` the `(id, sh, shh)` verify rows.
    * `prunePayload = true` turns the verify fetch into a
    * candidate-driven pruned read (see [[finishPairs]]): correct for
    * payload frames backed by a stable snapshot (a VersionedTable
    * read), because the candidate set is checkpointed before the ids
    * are collected.
    */
  private[graft] final case class IndexSide(tok: DataFrame, payload: DataFrame,
                                            prunePayload: Boolean = false)

  private[graft] def pairsImpl(rows: DataFrame, index: Option[IndexSide],
                               threshold: Double, hotTokenCap: Int,
                               hotChunk: Int, maxHotCollect: Int,
                               indexTokenCounts: Option[DataFrame],
                               hotInputs: HotInputs): DataFrame = {
    require(hotTokenCap >= 1, s"hotTokenCap must be >= 1, got $hotTokenCap")
    require(hotChunk >= 1, s"hotChunk must be >= 1, got $hotChunk")
    require(maxHotCollect >= 0, s"maxHotCollect must be >= 0, got $maxHotCollect")
    val newTok = rows.select(col("id").as("id_new"), col("sz").as("sz_new"),
      posexplode(col("prefix")).as(Seq("pn", "g")))
    // Index-side tokens are PREFILTERED to the batch's token vocabulary
    // before any shuffle: a candidate needs g equal on both sides, so
    // dropping index tokens absent from the batch loses nothing —
    // exact — while the long-run ingest regime (index vocabulary grows
    // forever, batch stays fixed) turns the candidate join's index leg
    // from shuffle-O(index tokens) into shuffle-O(tokens matching the
    // batch). The semi-join's build side is the batch vocabulary —
    // O(batch), the side an ingest pipeline bounds — so AQE plans it
    // as a broadcast probe over the index scan: the index is READ
    // (column-pruned: id, sz, prefix) but never exchanged.
    val batchVocab = hotInputs.batchFreq.map(_.select(col("g")))
      .getOrElse(newTok.select(col("g")).distinct())
    val rhsTok = {
      val batchSide = rows.select(col("id").as("id_old"),
        col("sz").as("sz_old"),
        posexplode(col("prefix")).as(Seq("po", "g")), lit(true).as("within"))
      index match {
        case Some(is) =>
          val idxSide = is.tok
            .select(col("id_old"), col("sz_old"), col("po"), col("g"),
              lit(false).as("within"))
            .join(batchVocab, Seq("g"), "left_semi")
          batchSide.unionByName(idxSide)
        case None => batchSide
      }
    }

    // Per-candidate-row filters, applied on BOTH paths the moment a
    // (new, old) row materializes — while it is slim (no arrays):
    //   - size-ratio bound (J ≥ t ⇒ t·|a| ≤ |b| ≤ |a|/t);
    //   - the PPJoin positional bound at ROW level. Exact despite using
    //     THIS token's positions: prefixes share the global sort order,
    //     so the order-minimal shared token s0 has the componentwise-
    //     minimal (pn, po) — its row's bound dominates every other
    //     row's. A viable pair's s0 row always survives (its bound is
    //     the true one the post-group filter re-checks), and min(pn)/
    //     min(po) over survivors still come from s0, so the grouped
    //     result is unchanged; rows of non-viable tokens just die early
    //     instead of riding the exchange into the groupBy.
    def prune(cand: DataFrame): DataFrame = cand
      .filter((!col("within") || col("id_new") < col("id_old"))
        && col("sz_old").cast("double") >= lit(threshold) * col("sz_new")
        && col("sz_new").cast("double") >= lit(threshold) * col("sz_old")
        && least(col("sz_new") - col("pn"), col("sz_old") - col("po"))
          .cast("double") >=
          lit(threshold / (1.0 + threshold)) * (col("sz_new") + col("sz_old")).cast("double"))

    // ---- hot-token split --------------------------------------------
    // Frequency-bound fast path: every lhs frequency is ≤ batchMaxFreq
    // and every rhs frequency ≤ batchMaxFreq + indexMaxCnt (the rhs
    // unions the batch in; a token's batch contribution and index
    // contribution are each bounded by their side's max). When that sum
    // is ≤ cap no token can be hot, so the plain single-join plan goes
    // out with ZERO eager work — the common-corpus ingest path. A lying
    // bound only mis-ROUTES (exact either way); see [[HotInputs]].
    val provablyCold = index match {
      case None => hotInputs.batchMaxFreq.exists(_ <= hotTokenCap)
      case Some(_) => hotInputs.batchMaxFreq.zip(hotInputs.indexMaxCnt)
        .exists { case (bm, im) => bm + im <= hotTokenCap }
    }
    if (provablyCold) {
      return finishPairs(rows, index, threshold,
        prune(newTok.join(rhsTok, Seq("g")))
          .select(col("id_new"), col("id_old"), col("within"),
            col("sz_new"), col("sz_old"), col("pn"), col("po")))
    }

    // The hot SET is a pure performance split: any membership is exact,
    // so the threshold needs no cross-side product join — f_n·f_o >
    // cap² implies one side exceeds cap. Detection is restricted to
    // tokens PRESENT IN THE BATCH: a token absent from newTok matches
    // nothing in the equi-join on either path, so its routing is
    // irrelevant — and keeping its rhs rows on the cold path skips
    // pointless grid machinery for rhs-only Zipf heads.
    //
    // Index-side frequencies come from the maintained count table when
    // the caller has one (ZERO passes over the index prefix stream —
    // the ingest-mode contract; f_o = f_batch + cnt because the rhs
    // unions the batch rows in). Without one (legacy index, or a bare
    // similarity-join call) fall back to the one-shot recount: both
    // sides in ONE map-side-combined count via a side tag. An ingest
    // loop that already aggregated the batch's token counts passes them
    // in ([[HotInputs.batchFreq]]) so the batch is not re-exploded.
    val batchFreq = hotInputs.batchFreq
      .map(_.select(col("g"), col("cnt").cast("long").as("__fn")))
      .getOrElse(newTok.groupBy(col("g")).agg(count(lit(1)).as("__fn")))
    val hotTok = (index, indexTokenCounts) match {
      case (Some(_), Some(cnt)) =>
        batchFreq
          .join(cnt.select(col("g"), col("cnt").cast("long").as("__ci")),
            Seq("g"), "left")
          .filter(col("__fn") > hotTokenCap ||
            col("__fn") + coalesce(col("__ci"), lit(0L)) > hotTokenCap)
          .select(col("g"))
      case (Some(_), None) =>
        newTok.select(col("g"), lit(0).as("__s"))
          .unionByName(rhsTok.select(col("g"), lit(1).as("__s")))
          .groupBy(col("g"))
          .agg(count(when(col("__s") === 0, 1)).as("__fn"),
            count(when(col("__s") === 1, 1)).as("__fo"))
          .filter(col("__fn") > hotTokenCap || col("__fo") > hotTokenCap)
          .select(col("g"))
      case (None, _) =>
        // rhs = the batch itself, so f_o = f_n: one count suffices
        batchFreq.filter(col("__fn") > hotTokenCap).select(col("g"))
    }

    // bounded, stated collect (≤ maxHotCollect + 1 rows): lets the
    // common no-hot-token ingest keep the ORIGINAL single-join plan
    // and a Zipf-head hot set become inlined isin literals
    val hotHead = hotTok.limit(maxHotCollect + 1).collect().map(_.getString(0))

    if (hotHead.isEmpty) {
      // no hot tokens → the split machinery would only add stages;
      // emit the plain equi-join plan
      return finishPairs(rows, index, threshold,
        prune(newTok.join(rhsTok, Seq("g")))
          .select(col("id_new"), col("id_old"), col("within"),
            col("sz_new"), col("sz_old"), col("pn"), col("po")))
    }
    val (coldOf, hotOf): (DataFrame => DataFrame, DataFrame => DataFrame) =
      if (hotHead.length <= maxHotCollect) {
        // small hot set: codegen'd InSet membership, zero extra joins
        (df => df.filter(!col("g").isin(hotHead.toSeq: _*)),
         df => df.filter(col("g").isin(hotHead.toSeq: _*)))
      } else {
        // adversarial: more hot tokens than the collect bound — keep
        // the membership fully distributed. Plain SHUFFLE anti/semi
        // joins, deliberately NOT broadcast(hotTok): a broadcast build
        // side is collected to the driver, re-materializing exactly
        // the unbounded set maxHotCollect exists to keep off the
        // driver (ADVICE r10). AQE's exchange reuse dedups the
        // repeated hotTok subtree across the four joins.
        (df => df.join(hotTok, Seq("g"), "left_anti"),
         df => df.join(hotTok, Seq("g"), "left_semi"))
      }

    // cold tokens: the plain equi-join
    val candCold = prune(coldOf(newTok).join(coldOf(rhsTok), Seq("g")))
      .select(col("id_new"), col("id_old"), col("within"),
        col("sz_new"), col("sz_old"), col("pn"), col("po"))

    // hot tokens: EXACT chunk grid (the SubBuckets rank-chunk idea,
    // minus its stitching recall floor — pair joins between two sides
    // admit a lossless grid). Each side of a hot token's bucket is
    // ranked BY DOC SIZE and cut into ≤hotChunk-row chunks; a pair
    // (a, b) lives in exactly one grid cell (chunk(a), chunk(b)), and a
    // cell is joined only when its size ranges could satisfy the
    // size-ratio bound (chunk min/max sz overlap t·[lo, hi] — implied
    // by any surviving pair, so skipping non-viable cells drops no
    // pair). Both sides replicate to the viable cells of their chunk,
    // making (g, chunk_a, chunk_b) the join key: every join group is
    // ≤ hotChunk rows a side, every task's pair work ≤ hotChunk², and
    // exchange volume is Σ viable cells · hotChunk per side — the
    // f_n·f_o/chunk grid, never the f_n·f_o bucket.
    val lhsHot = hotOf(newTok)
      .withColumn("__ca", floor(
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("sz_new"), col("id_new"), col("pn")))
          .cast("double") - 1.0) / hotChunk).cast("long"))
    val rhsHot = hotOf(rhsTok)
      .withColumn("__cb", floor(
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("sz_old"), col("id_old"), col("po")))
          .cast("double") - 1.0) / hotChunk).cast("long"))
    val boundsA = lhsHot.groupBy(col("g"), col("__ca"))
      .agg(min(col("sz_new")).as("__loA"), max(col("sz_new")).as("__hiA"))
    val boundsB = rhsHot.groupBy(col("g"), col("__cb"))
      .agg(min(col("sz_old")).as("__loB"), max(col("sz_old")).as("__hiB"))
    val cells = boundsA.join(boundsB, Seq("g"))
      // necessary for ANY pair in the cell to pass the size bound:
      // t·min(sz_a) ≤ max(sz_b) and t·min(sz_b) ≤ max(sz_a)
      .filter(col("__hiB").cast("double") >= lit(threshold) * col("__loA").cast("double")
        && col("__hiA").cast("double") >= lit(threshold) * col("__loB").cast("double"))
      .select(col("g"), col("__ca"), col("__cb"))
    val candHot = prune(
      lhsHot.join(cells, Seq("g", "__ca"))
        .join(rhsHot.join(cells, Seq("g", "__cb")),
          Seq("g", "__ca", "__cb")))
      .select(col("id_new"), col("id_old"), col("within"),
        col("sz_new"), col("sz_old"), col("pn"), col("po"))

    // Candidate rows (one per shared prefix token, each token routed
    // through exactly one path) reduce by pair to the EARLIEST shared
    // token's positions — prefixes are sorted in the global order, so
    // min(pn)/min(po) both belong to the order-minimal shared token s0,
    // and every token before it on either side is provably NOT shared.
    // That gives the PPJoin-style positional bound |∩| ≤ min(sz_a − pn,
    // sz_b − po): candidates whose first shared token sits late in both
    // prefixes are pruned BEFORE any shingle array is fetched (the
    // array-carrying verify join is the expensive stage — this
    // aggregation also subsumes candidate dedup).
    finishPairs(rows, index, threshold, candCold.unionByName(candHot))
  }

  /** Bound on the candidate-id collect that drives the pruned verify
    * fetch: at most this many distinct cross-candidate `id_old`s are
    * materialized to the driver (≤ 8 B each ⇒ ≤ 32 KB) and pushed into
    * the payload scan as an `In` filter — parquet row-group stats on
    * the id-sorted index files then skip everything but the row groups
    * holding candidates, and a batch with ZERO cross candidates (the
    * common clean batch) reads NO payload bytes at all. Past the bound
    * (a batch that near-dups thousands of indexed docs) the fetch falls
    * back to the full payload frame — the pre-r13 plan, never a wrong
    * answer. Kept well under the parquet filter-conversion depth
    * (`spark.sql.parquet.pushdown.inFilterThreshold` must be ≥ this for
    * the pushdown to engage; reads stay correct without it, just
    * unpruned).
    */
  val MaxPayloadIdCollect = 1024

  /** Bound on the SLIM candidate rows materialized to the driver on
    * the ingest path (5 fixed-width columns ⇒ ≤ ~5 MB): within it the
    * candidate set becomes a broadcast local relation serving both the
    * payload-id pushdown and the verify join — one bounded job instead
    * of a checkpoint plus a second collect. A batch generating more
    * verified-candidate PAIRS than this is already index-rescan-sized;
    * it falls back to the checkpointed distributed plan.
    */
  val MaxCandRowCollect = 1 << 17

  /** Test-only instrumentation (the [[graft.sources.VersionedTable.parsedEntries]]
    * pattern): the ingest path's two pruned index reads, captured so
    * specs can assert the WIRING — that [[processBatch]] really feeds
    * the candidate join from the bucket-pruned postings scan and the
    * verify join from the candidate-pruned payload scan — at the plan
    * level. Volatile single-slot: meaningful only for a single ingest
    * at a time (concurrent ingests overwrite each other's capture).
    */
  @volatile private[graft] var lastIndexTok: Option[DataFrame] = None
  @volatile private[graft] var lastPayloadIdx: Option[DataFrame] = None

  /** The path-independent tail of [[pairsImpl]]: per-pair positional
    * reduce over pruned candidate rows, then filter-then-refine verify
    * against the shingle payloads. With `prunePayload` the slim
    * candidate set is checkpointed first and the index-side payload
    * read restricted to the candidates' ids (bounded collect, In
    * pushdown) — the verify stage then reads O(candidates) of the
    * index's heavy columns instead of O(index).
    */
  private def finishPairs(rows: DataFrame, index: Option[IndexSide],
                          threshold: Double, candRows: DataFrame): DataFrame = {
    val candSlim = candRows
      .groupBy(col("id_new"), col("id_old"), col("within"),
        col("sz_new"), col("sz_old"))
      .agg(min(col("pn")).as("pn"), min(col("po")).as("po"))
      // overlap ≥ t/(1+t)·(sz_a+sz_b) is J ≥ t rewritten; pruning only
      // when even the positional upper bound cannot reach it — exact
      .filter(least(col("sz_new") - col("pn"), col("sz_old") - col("po"))
        .cast("double") >=
        lit(threshold / (1.0 + threshold)) * (col("sz_new") + col("sz_old")).cast("double"))
      .select(col("id_new"), col("id_old"), col("within"),
        col("sz_new"), col("sz_old"))
    // The pruning path needs the candidate set twice (payload-id
    // pushdown + verify join). ONE bounded collect serves both: the
    // slim rows (5 long/bool columns, ~40 B each ⇒ ≤ 5 MB at the
    // bound) come back as a broadcast-sized local relation, so the
    // verify stage probes the payload scans with NO candidate
    // exchange and no checkpoint job. Past the row bound (an ingest
    // near-dupping >128k pairs) fall back to a checkpoint + full
    // payload — the pre-r13 plan, never a wrong answer.
    val prune = index.exists(_.prunePayload)
    val candHead: Option[Array[org.apache.spark.sql.Row]] =
      if (!prune) None
      else {
        val head = candSlim.limit(MaxCandRowCollect + 1).collect()
        if (head.length <= MaxCandRowCollect) Some(head) else None
      }
    val cand = candHead match {
      case Some(head) =>
        val sp = rows.sparkSession
        broadcast(sp.createDataFrame(
          java.util.Arrays.asList(head: _*), candSlim.schema))
      case None => if (prune) candSlim.localCheckpoint() else candSlim
    }
    val idxPayload = index.map { is =>
      if (!is.prunePayload) is.payload
      else {
        val ids = candHead.map(_.iterator
          .filter(!_.getBoolean(2)).map(_.getLong(1)).toArray.distinct)
        val p = ids match {
          case None => is.payload // over the collect bound: full fetch
          case Some(io) if io.length > MaxPayloadIdCollect => is.payload
          case Some(io) if io.isEmpty =>
            is.payload.filter(lit(false)) // no cross candidates: zero payload read
          case Some(io) => is.payload.filter(col("id").isin(io.toSeq: _*))
        }
        lastPayloadIdx = Some(p)
        p
      }
    }
    val payload = idxPayload match {
      case Some(p) => rows.select(col("id"), col("sh"), col("shh"))
        .unionByName(p.select(col("id"), col("sh"), col("shh")))
      case None => rows.select(col("id"), col("sh"), col("shh"))
    }
    cand
      .join(rows.select(col("id").as("id_new"),
        col("sh").as("sh_a"), col("shh").as("shh_a")), Seq("id_new"))
      .join(payload.select(col("id").as("id_old"),
        col("sh").as("sh_b"), col("shh").as("shh_b")), Seq("id_old"))
      // hash filter: |hash-set ∩| ≥ |string-set ∩| while the union term
      // sz_a + sz_b − ih can only shrink ⇒ hashJ ≥ trueJ ⇒ complete
      .withColumn("__ih", size(array_intersect(col("shh_a"), col("shh_b"))).cast("long"))
      .filter(col("__ih").cast("double") >=
        lit(threshold) * (col("sz_new") + col("sz_old") - col("__ih")).cast("double"))
      // string refine on the survivors only (conditionally reached rows)
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("__u", col("sz_new") + col("sz_old") - col("__i"))
      .filter(col("__i").cast("double") >= lit(threshold) * col("__u").cast("double"))
      .select(col("id_new"), col("id_old"), col("within"),
        round(col("__i").cast("double") / col("__u"), 6).as("jaccard"))
  }

  /** Exact within-batch similarity self-join over already-computed
    * signature rows: all (id_a < id_b) pairs with Jaccard ≥ t —
    * [[batchPairs]] with no index side. Output: `id_a, id_b`.
    */
  def selfPairs(rows: DataFrame, threshold: Double): DataFrame =
    batchPairs(rows, None, threshold)
      .select(col("id_new").as("id_a"), col("id_old").as("id_b"))

  /** Exact cross-set similarity join: all (new, indexed) pairs with
    * Jaccard ≥ t. Output: `id_new, id_old, jaccard`.
    */
  def crossPairs(newRows: DataFrame, indexRows: DataFrame,
                 threshold: Double): DataFrame =
    batchPairs(newRows, Some(indexRows), threshold)
      .filter(!col("within"))
      .select(col("id_new"), col("id_old"), col("jaccard"))

  /** Path of the prefix-token frequency table maintained NEXT TO a
    * signature index: `<indexTable>_tokfreq` (a sibling directory —
    * never inside the index table, whose data files own that tree).
    * Row schema: `g: string, cnt: long, batch: long` — per-batch count
    * PARTIALS, merged on read and folded by [[compactTokenFreq]],
    * exactly the [[graft.text.IncrementalStats]] algebraic-partials
    * pattern. It exists so [[batchPairs]] hot-token detection reads a
    * compacted 2-column table instead of re-exploding the FULL index
    * prefix stream on every ingest (the r10 per-ingest O(index) term;
    * VERDICT r10 directive #1).
    */
  def tokenFreqTable(indexTable: String): String =
    indexTable.stripSuffix("/") + "_tokfreq"

  /** One batch's prefix-token count partials from its signature rows:
    * `g, cnt`. O(batch) — nothing reads the index. Pure; shared by
    * [[processBatch]], [[rebuildTokenFreq]] and tests.
    */
  def batchTokenCounts(rows: DataFrame): DataFrame =
    rows.select(explode(col("prefix")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))

  /** Sidecar file (inside the count table's directory, beside its
    * `data/` and log — a table-root file neither owns) holding an UPPER
    * BOUND on the table's largest merged per-token count. It is what
    * lets the common ingest skip hot-token detection entirely
    * ([[HotInputs.indexMaxCnt]]): reading one small file replaces the
    * O(distinct tokens) scan+aggregate of the count table when the
    * bound proves no token can be hot.
    *
    * Maintenance invariant (single-writer ingest, the streaming
    * operating mode): the hint is bumped by the batch's own max count
    * BEFORE the partials commit — Σ of per-batch maxes ≥ max of the
    * per-token Σ, and a crash between hint write and commit leaves the
    * hint OVER the truth, the performance-safe direction (over-routing
    * through the exact grid). [[compactTokenFreq]] resets it to the
    * exact max. A concurrent out-of-band compaction racing an ingest
    * can leave the hint UNDER the truth until the next compaction —
    * then a hot token merely sits in the exact-but-slower equi-join
    * bucket; no path makes the answer wrong. Absent file (legacy
    * table) means "unknown": callers fall back to the count-table
    * join.
    */
  private[graft] def maxCntHintPath(tokenFreqTable: String): java.nio.file.Path =
    java.nio.file.Paths.get(tokenFreqTable, "_graft_maxcnt_hint")

  /** Per-writer hint files — the monotonic face of the hint under
    * CONCURRENT writers (VERDICT r12 finding #3): each ingesting JVM
    * owns one file in this directory and only ever writes its OWN, so
    * two racing writers can never clobber each other's bound — the
    * last-writer-wins transient of the single-file scheme is gone. The
    * effective hint is the MAX over the legacy file and every per-writer
    * file; [[compactTokenFreq]]'s exact reset clears the directory and
    * rewrites the legacy file (a racing ingest's bump landing inside
    * that reset window can still transiently under-count — the
    * documented, routing-only compaction race).
    */
  private[graft] def maxCntHintDir(tokenFreqTable: String): java.nio.file.Path =
    java.nio.file.Paths.get(tokenFreqTable, "_graft_maxcnt_hints")

  /** This writer's hint-file identity — per (JVM, thread), stable for
    * the thread's lifetime, so a writer's successive bumps replace one
    * file instead of leaking one per batch, and concurrent ingest
    * THREADS in one JVM (the multi-writer spec's shape) own distinct
    * files just like separate processes do. File count is bounded by
    * the writer-pool size and cleared at every exact reset.
    */
  private val hintWriterId: ThreadLocal[String] =
    ThreadLocal.withInitial(() => java.util.UUID.randomUUID().toString)

  private def readLongFile(p: java.nio.file.Path): Option[Long] =
    if (!java.nio.file.Files.isRegularFile(p)) None
    else scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
    ).toOption

  private def writeLongFile(p: java.nio.file.Path, v: Long): Unit = {
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".${p.getFileName}.${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The effective hint: max over the legacy single file and every
    * per-writer file — monotone between compactions because each writer
    * only replaces its own file and the max can only grow.
    */
  def readMaxCntHint(tokenFreqTable: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val legacy = readLongFile(maxCntHintPath(tokenFreqTable))
    val dir = maxCntHintDir(tokenFreqTable)
    val perWriter =
      if (!java.nio.file.Files.isDirectory(dir)) Seq.empty[Long]
      else {
        val it = java.nio.file.Files.list(dir)
        try it.iterator().asScala
          .filterNot(_.getFileName.toString.startsWith("."))
          .flatMap(readLongFile).toSeq
        finally it.close()
      }
    val all = legacy.toSeq ++ perWriter
    if (all.isEmpty) None else Some(all.max)
  }

  /** EXACT reset (compaction/rebuild path): clear every per-writer file
    * and pin the legacy file to the true max. Not for ingest bumps —
    * those go through [[bumpOwnHint]] so concurrent writers stay
    * monotonic.
    */
  def writeMaxCntHint(tokenFreqTable: String, bound: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val dir = maxCntHintDir(tokenFreqTable)
    if (java.nio.file.Files.isDirectory(dir)) {
      val it = java.nio.file.Files.list(dir)
      try it.iterator().asScala.foreach(p =>
        java.nio.file.Files.deleteIfExists(p))
      finally it.close()
    }
    writeLongFile(maxCntHintPath(tokenFreqTable), bound)
  }

  /** Ingest-side bump: replace THIS writer's file. Single-owner, so the
    * write needs no compare-and-swap — monotonicity of the global max
    * falls out of per-writer ownership. The value may be lower than the
    * file's previous content only from the same writer's own
    * tighten-after-commit step (pre-commit bound nRows ≥ post-commit
    * observed max), which keeps the drift between compactions
    * O(Σ batch maxes), not O(Σ batch rows).
    */
  private[graft] def bumpOwnHint(tokenFreqTable: String, bound: Long): Unit =
    writeLongFile(maxCntHintDir(tokenFreqTable).resolve(hintWriterId.get()),
      bound)

  /** Merged per-token counts at `version` (default latest): `g, cnt`,
    * one row per distinct prefix token of the index — the shape
    * [[batchPairs]]' `indexTokenCounts` expects. Read cost is one
    * groupBy over the partials; [[compactTokenFreq]] keeps that
    * O(distinct tokens).
    */
  def tokenCounts(spark: SparkSession, indexTable: String,
                  version: Option[Long] = None): DataFrame = {
    val tf = tokenFreqTable(indexTable)
    version.map(v => VersionedTable.readVersion(spark, tf, v))
      .getOrElse(VersionedTable.read(spark, tf))
      .groupBy(col("g")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Fold all count partials into one row per token — resets the
    * hot-detection read to O(distinct tokens). Conflict-checked RMW
    * `overwrite` (the [[graft.text.IncrementalStats.compact]] recipe):
    * concurrent appends are never lost, pinned readers below the
    * compaction still replay the partials.
    */
  def compactTokenFreq(spark: SparkSession, indexTable: String,
                       attempts: Int = 8): Unit = {
    val tf = tokenFreqTable(indexTable)
    var left = attempts
    var done = false
    while (!done) {
      val base = VersionedTable.latestVersion(tf)
      if (base < 0) return // no count table yet (legacy index): nothing to fold
      val merged = VersionedTable.readVersion(spark, tf, base)
        .groupBy(col("g")).agg(sum(col("cnt")).as("cnt"))
        .withColumn("batch", lit(-1L))
      try {
        VersionedTable.commit(merged, tf, "overwrite", None, None,
          expectedVersion = Some(base))
        done = true
      } catch {
        case e: java.util.ConcurrentModificationException =>
          left -= 1; if (left <= 0) throw e // a racing append won; re-read
      }
    }
    // reset the hint to the EXACT max (one small agg over the rows just
    // folded — O(distinct tokens), amortized over the compaction
    // cadence); the per-ingest Σ-of-batch-maxes drift starts fresh
    val trueMax = VersionedTable.read(spark, tf)
      .agg(coalesce(max(col("cnt")), lit(0L))).head.getLong(0)
    writeMaxCntHint(tf, trueMax)
  }

  /** Backfill the count table for a LEGACY index built before the table
    * existed: ONE full pass over the index prefix stream (the stated
    * migration cost — every subsequent ingest then stays O(batch)),
    * committed as a single overwrite. Returns the committed version.
    */
  def rebuildTokenFreq(spark: SparkSession, indexTable: String): Long = {
    val tf = tokenFreqTable(indexTable)
    val counts = batchTokenCounts(
        VersionedTable.read(spark, indexTable).select(col("prefix")))
      .withColumn("batch", lit(-1L))
    val v = VersionedTable.commit(counts, tf, "overwrite",
      None, None, expectedVersion = None)
    val trueMax = VersionedTable.readVersion(spark, tf, v)
      .agg(coalesce(max(col("cnt")), lit(0L))).head.getLong(0)
    writeMaxCntHint(tf, trueMax)
    v
  }

  // ---- posting-list layout (the 100 TB candidate-read path) ------------

  /** Reserved txn app identity for postings COVERAGE tags: a postings
    * commit tagged `(PostingsApp, V)` asserts "at this commit's time,
    * posting rows exist for every doc commit ≤ V" (its own batch plus a
    * heal of any gap it observed — see [[processBatch]]). `txnMaxes`
    * then answers "how far do postings reach" in O(checkpoint tail).
    */
  val PostingsApp = "__graft_postings"

  /** Path of the posting-list sidecar maintained next to a signature
    * index: `<indexTable>_postings`. Row schema: `b: int, g: string,
    * id: long, sz: long, po: int, v: long` — one row per (doc, prefix
    * token), where `b = pmod(xxhash64(g), nBuckets)` is the token-hash
    * bucket and `v` the doc-table version the doc's row committed at.
    *
    * This is SCALING.md's posting-list layout made real: the candidate
    * join's index leg reads THIS table filtered to the batch's bucket
    * set (`b IN (...)` — pushed to parquet, so bucket-range-clustered
    * files prune at the row-group level) instead of scanning and
    * exploding every index row's prefix array. Per-ingest candidate
    * read cost is O(postings in matching buckets) — bounded by the
    * BATCH's vocabulary times the per-bucket row count, not by index
    * size; re-bucketing at compaction (bucket count scales with the
    * index) keeps per-bucket rows constant, so the read stays O(batch
    * vocab) as the corpus grows. `v` makes every read snapshot-pure:
    * filtering `v <= pinnedDocVersion` excludes racing writers' newer
    * postings AND a replayed batch's own rows, exactly mirroring the
    * doc-table pin.
    */
  def postingsTable(indexTable: String): String =
    indexTable.stripSuffix("/") + "_postings"

  /** Default token-hash bucket count for NEW postings tables. Pinned
    * per table in a sidecar file at creation (changing the default
    * never re-shuffles an existing table's bucket ids); compaction may
    * re-bucket by rewriting rows AND the sidecar together.
    */
  val DefaultPostingsBuckets = 256

  /** Target posting rows per data file: small batches write ONE file,
    * large ones split into bucket-range-contiguous files so a probe of
    * k buckets touches ~k files' row groups.
    */
  val PostingsRowsPerFile = 400000L

  private[graft] def postingsBucketsPath(postingsTable: String): java.nio.file.Path =
    java.nio.file.Paths.get(postingsTable, "_graft_postings_nb")

  /** Re-bucket INTENT sidecar: `nb newBasePt` written before a
    * modulus-changing [[rebuildPostings]] commits, finalized into
    * [[postingsBucketsPath]] (and deleted) after. The nb file and the
    * postings overwrite cannot land atomically, so either single-file
    * ordering leaves a crash window where the sidecar's modulus
    * disagrees with the rows' — and every later ingest then computes
    * its bucket probe under the WRONG modulus and silently misses
    * candidates. The intent makes the cutover crash-recoverable:
    * [[readPostingsBuckets]] resolves a surviving intent by checking
    * whether its commit landed (the overwrite at exactly
    * `basePt + 1` — [[rebuildPostings]] pins `expectedVersion`, so no
    * other commit can occupy that slot with mode `overwrite`): landed
    * ⇒ heal the nb file to the intent's value; not landed ⇒ ignore it
    * (rows still carry the old modulus). A not-landed intent is never
    * deleted by readers — only the next rebuild clears it — so the
    * resolution can never race a rebuild that is mid-commit.
    */
  private[graft] def postingsNbIntentPath(postingsTable: String): java.nio.file.Path =
    java.nio.file.Paths.get(postingsTable, "_graft_postings_nb_intent")

  private[graft] def writeNbIntent(postingsTable: String, nb: Int,
                                   basePt: Long): Unit = {
    val p = postingsNbIntentPath(postingsTable)
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".${p.getFileName}.${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp, s"$nb $basePt".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private[graft] def readNbIntent(postingsTable: String): Option[(Int, Long)] = {
    val p = postingsNbIntentPath(postingsTable)
    if (!java.nio.file.Files.isRegularFile(p)) None
    else scala.util.Try {
      val parts = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .trim.split("\\s+")
      (parts(0).toInt, parts(1).toLong)
    }.toOption
  }

  def readPostingsBuckets(postingsTable: String): Option[Int] = {
    val raw = readLongFile(postingsBucketsPath(postingsTable)).map(_.toInt)
    readNbIntent(postingsTable) match {
      case Some((nb, basePt)) if VersionedTable.history(postingsTable)
          .exists(c => c.version == basePt + 1 && c.mode == "overwrite") =>
        // the re-bucket committed but crashed before finalizing the nb
        // file: heal it (idempotent) and drop the intent. Cost (one log
        // listing) is paid only while an intent file exists.
        writePostingsBuckets(postingsTable, nb)
        java.nio.file.Files.deleteIfExists(postingsNbIntentPath(postingsTable))
        Some(nb)
      case _ => raw
    }
  }

  def writePostingsBuckets(postingsTable: String, nb: Int): Unit =
    writeLongFile(postingsBucketsPath(postingsTable), nb.toLong)

  /** Posting rows of one batch of signature rows (`id, sz, prefix` at
    * minimum), tagged with the doc-table version they commit under.
    */
  def postingsFor(rows: DataFrame, nb: Int, docVersion: Long): DataFrame =
    rows.select(col("id"), col("sz"),
        posexplode(col("prefix")).as(Seq("po", "g")))
      .select(pmod(xxhash64(col("g")), lit(nb)).cast("int").as("b"),
        col("g"), col("id"), col("sz"), col("po").cast("int").as("po"),
        lit(docVersion).as("v"))

  /** Bucket-range clustering for a postings write: contiguous `b`
    * ranges per file, rows sorted by (b, g) within — parquet row-group
    * min/max stats on `b` then make the probe's `b IN (batch buckets)`
    * pushdown skip everything outside the batch's bucket set.
    * `estRows` sizes the file count (an estimate is fine; it steers
    * layout granularity only).
    */
  private def clusterPostings(p: DataFrame, estRows: Long): DataFrame = {
    val files = math.max(1L, estRows / PostingsRowsPerFile).toInt
    // single-file writes (the common batch) skip repartitionByRange:
    // its range-boundary SAMPLING pass re-executes the posting explode
    // once before the write does — a measurable per-ingest tax for a
    // partitioning that a 1-file layout doesn't need. coalesce keeps
    // the plan shuffle-free; the within-file sort alone gives the
    // row-group b/g stats the probe pushdown prunes on.
    (if (files <= 1) p.coalesce(1)
     else p.repartitionByRange(files, col("b"), col("g")))
      .sortWithinPartitions(col("b"), col("g"))
  }

  /** Posting rows for the doc commits in `uptoVer`'s replay closure
    * with version > `aboveCovered` — the HEAL/migration read: each dir
    * is a plain parquet read exploded on the fly, so a crash window
    * (doc rows committed, postings commit lost) or a legacy pre-postings
    * index never makes an ingest wrong, only un-pruned for exactly the
    * uncovered tail. Returns None when nothing is uncovered.
    */
  private def healPostings(spark: SparkSession, indexTable: String, nb: Int,
                           aboveCovered: Long, uptoVer: Long,
                           belowVer: Option[Long] = None): Option[DataFrame] =
    VersionedTable.snapshotClosure(indexTable, uptoVer)
      .filter(c => c.version > aboveCovered
        && belowVer.forall(c.version < _))
      .map { c =>
        postingsFor(
          spark.read.parquet(
            java.nio.file.Paths.get(indexTable, c.dataDir).toString)
            .select(col("id"), col("sz"), col("prefix")),
          nb, c.version)
      }
      .reduceOption(_.unionByName(_))

  /** Backfill the postings sidecar for a LEGACY index in one stated
    * O(index) pass (every subsequent ingest then reads only matching
    * buckets). Idempotent: an OVERWRITE tagged with the doc version it
    * covers. [[processBatch]] also auto-migrates lazily — the first
    * ingest on a legacy index heals the full gap and commits it — so
    * this explicit form exists for operators who want the migration
    * paid at a chosen time. Returns the committed postings version.
    *
    * `newBuckets` RE-BUCKETS while rebuilding — the knob that keeps
    * per-bucket fill constant as the corpus grows (read cost per
    * ingest is batch-buckets × fill). Changing the bucket count is a
    * CUTOVER, not a hot swap: an ingest that read the old sidecar
    * count while the rebuild commits could compute its probe set under
    * the wrong modulus and miss candidates, so the [[retrain]]
    * discipline applies verbatim — quiesce ingest across the
    * re-bucket, or re-run the affected batch. (Same-count rebuilds —
    * compaction's path — are free of the MODULUS race: row `b` values
    * are identical under either snapshot. The separate race against a
    * concurrent writer's postings APPEND — an unconditional overwrite
    * would erase its rows while its coverage tag survives — is closed
    * for both paths by the conflict-checked commit below.) Capped at
    * [[MaxPayloadIdCollect]] so the bucket probe's In list always
    * stays within the parquet pushdown conversion bound.
    */
  def rebuildPostings(spark: SparkSession, indexTable: String,
                      newBuckets: Option[Int] = None): Long =
    // serialized under the index's maintenance lease (re-entrant from
    // compactIndex); the RMW below stays conflict-checked regardless
    graft.sources.MaintenanceLease.withLease(indexTable, "rebuildPostings") {
    val pt = postingsTable(indexTable)
    val nb = newBuckets
      .getOrElse(readPostingsBuckets(pt).getOrElse(DefaultPostingsBuckets))
    require(nb >= 1 && nb <= MaxPayloadIdCollect,
      s"postings bucket count must be in [1, $MaxPayloadIdCollect], got $nb")
    require(VersionedTable.latestVersion(indexTable) >= 0,
      s"nothing to rebuild: $indexTable is empty")
    // Conflict-checked read-modify-write (r13 review finding): a blind
    // overwrite racing a concurrent writer's postings APPEND would
    // erase that append's rows while its coverage tag survives in
    // txnMaxes — a permanent silent hole (covered says V+1, rows for
    // V+1 gone, heal never fires). Pinning the overwrite to the
    // postings version this rebuild read turns the race into a loud
    // ConcurrentModificationException + retry over the fresher doc log.
    //
    // The nb file finalizes AFTER the commit, guarded by the intent
    // protocol ([[postingsNbIntentPath]]): writing it before (the
    // pre-r13-review order) meant a crash — or this loop exhausting
    // its retries — left the sidecar claiming the NEW modulus over
    // rows still bucketed under the OLD one, and every later ingest's
    // bucket probe silently missed candidates. Any stale intent from a
    // previously crashed rebuild is cleared first (readers ignore a
    // not-landed intent, but it must not survive past a LATER commit
    // that could alias its basePt + 1 slot).
    java.nio.file.Files.deleteIfExists(postingsNbIntentPath(pt))
    val oldNb = readLongFile(postingsBucketsPath(pt)).map(_.toInt)
      .getOrElse(DefaultPostingsBuckets)
    var left = 8
    while (true) {
      val basePt = VersionedTable.latestVersion(pt)
      val docVer = VersionedTable.latestVersion(indexTable)
      val all = healPostings(spark, indexTable, nb, aboveCovered = -1L,
        uptoVer = docVer).get
      if (nb != oldNb) writeNbIntent(pt, nb, basePt)
      try {
        val v = VersionedTable.commit(clusterPostings(all,
            VersionedTable.read(spark, indexTable).count() * 8),
          pt, "overwrite", Some(docVer), Some(PostingsApp),
          expectedVersion = Some(basePt))
        writePostingsBuckets(pt, nb)
        java.nio.file.Files.deleteIfExists(postingsNbIntentPath(pt))
        return v
      } catch {
        case e: java.util.ConcurrentModificationException =>
          left -= 1
          if (left <= 0) {
            // the commit definitively did NOT land: drop the intent so
            // the sidecar cleanly keeps describing the (old) rows
            java.nio.file.Files.deleteIfExists(postingsNbIntentPath(pt))
            throw e
          } // racing append won; re-read
      }
    }
    -1L // unreachable
    }

  /** Cross-writer duplicate reconciliation (VERDICT r12 missing #3).
    * Concurrent writers racing on one index are safe but eventually-
    * consistent for SIMULTANEOUS cross-writer copies: two docs with
    * Jaccard ≥ t committed inside each other's pin-to-commit windows
    * can both report `kept` (each writer's pinned snapshot predates the
    * other's commit). This compaction-cadence sweep settles the window
    * after the fact: it runs the exact pair pass over ONLY the index
    * rows committed in `(fromVersion, toVersion]` (the race window —
    * bounded, never the whole index), clusters them, and emits every
    * member of each multi-member cluster: `id, batch, cluster`
    * (cluster = the component's min id). [[applyReconciliation]] then
    * demotes all but one STILL-KEPT member per cluster. The split
    * matters: which copy a racing pair kept depends on commit
    * interleaving (if writer A's pin landed after B's commit, A's copy
    * is already `dup_of_index` and B's is the keeper), so the sweep
    * reports the clusters and the apply step picks the survivor from
    * the decisions it is correcting — min id among the kept members,
    * never blindly the cluster min. Idempotent: same window + same
    * decisions ⇒ same corrections ⇒ re-applying changes nothing.
    */
  def reconcile(spark: SparkSession, indexTable: String, fromVersion: Long,
                toVersion: Long, threshold: Double): DataFrame = {
    val window = VersionedTable.snapshotClosure(indexTable, toVersion)
      .filter(_.version > fromVersion)
      .map(c => spark.read.parquet(
        java.nio.file.Paths.get(indexTable, c.dataDir).toString))
      .reduceOption(_.unionByName(_))
      .map(_.select(col("id"), col("sz"), col("sh"), col("shh"),
        col("prefix"), col("batch")).localCheckpoint())
    window match {
      case None =>
        val sp = spark; import sp.implicits._
        Seq.empty[(Long, Long, Long)].toDF("id", "batch", "cluster")
      case Some(w) =>
        // checkpointed: componentsOf's bounded probe collects the pair
        // set, and the overflow fallback (clustersStar) rescans it —
        // without this the whole candidate+verify pair pass re-runs on
        // the distributed path
        val pairs = selfPairs(w, threshold).localCheckpoint()
        // race-window pair sets are batch-sized, so the shared bounded
        // driver union-find ([[componentsOf]]) replaces ~log n
        // distributed star rounds of ~1 s fixed overhead each; past
        // the 2^20-edge bound the distributed path takes over unchanged
        val clusters = componentsOf(spark, w.select(col("id")).distinct(),
          pairs)
        // only multi-member clusters carry a potential race; singletons
        // (the overwhelming majority) are dropped before the join back
        val multi = clusters.groupBy(col("cluster"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .select(col("cluster"))
        w.select(col("id"), col("batch"))
          .join(clusters.join(multi, Seq("cluster")), Seq("id"))
          .select(col("id"), col("batch"), col("cluster"))
    }
  }

  /** Apply a [[reconcile]] correction set to a decision record
    * (`id, status, ...`): within each reconciled cluster, the min-id
    * member whose status is still `kept` survives; every OTHER kept
    * member demotes to `dup_of_index`. Rows already settled at ingest
    * (dup_within_batch, dup_of_index) are untouched, and a cluster with
    * no kept member (every copy already resolved against an older
    * canonical outside the window) changes nothing.
    */
  def applyReconciliation(decisions: DataFrame,
                          corrections: DataFrame): DataFrame = {
    val cl = corrections.select(col("id"), col("cluster").as("__rc"))
    val keeper = decisions.join(cl, Seq("id"))
      .filter(col("status") === "kept")
      .groupBy(col("__rc")).agg(min(col("id")).as("__keep"))
    decisions.join(cl, Seq("id"), "left")
      .join(keeper, Seq("__rc"), "left")
      .withColumn("status",
        when(col("status") === "kept" && col("__keep").isNotNull
            && col("id") =!= col("__keep"),
          lit("dup_of_index")).otherwise(col("status")))
      .drop("__rc", "__keep")
  }

  /** Target posting rows per token-hash bucket for [[compactIndex]]'s
    * auto-rebucket policy: a trickle ingest reads (its vocabulary's
    * bucket count) × this many rows, so holding it constant as the
    * corpus grows is what keeps the per-ingest candidate read O(batch
    * vocab) instead of O(index / fixed-nb). 2^20 slim rows ≈ tens of
    * MB per bucket — small against any real batch's own work.
    */
  val DefaultPostingsPerBucket: Long = 1L << 20

  /** OPTIMIZE the index trio coherently (the compaction face of the
    * posting-list layout): rewrite the doc table as id-range-clustered
    * files (tight id row-group stats keep the candidate-pruned payload
    * fetch sharp), REBUILD the postings sidecar against the compacted
    * snapshot (bucket-range files, racing-heal duplicates folded away,
    * coverage pinned to the new head), and fold the tf partials +
    * exact-reset the hint. One amortized O(index) pass per cadence —
    * the price that keeps every PER-INGEST cost O(batch). History
    * note: postings rebuilt here carry the compacted version's `v`,
    * so a reader time-traveling BELOW the compaction falls back to the
    * heal explode of its pinned closure — correct, just unpruned.
    *
    * `autoRebucket` closes the layout's one manual knob: per-bucket
    * fill grows with the corpus under a fixed modulus, so without
    * re-bucketing the trickle read degrades toward O(index / nb) —
    * an operator had to notice and run [[rebuildPostings]] with a
    * bigger `newBuckets` by hand. With the flag on, this compaction
    * GROWS the bucket count (monotone — shrinking churns the layout
    * for no read benefit) to hold fill at ~`postingsPerBucket` rows,
    * capped at [[MaxPayloadIdCollect]] (the pushdown-convertibility
    * bound; past the cap the honest answer is that per-bucket fill
    * grows again — stated, not hidden). A modulus change is the
    * CUTOVER [[rebuildPostings]] documents: it must not race an
    * in-flight ingest's probe, so the flag belongs on SINGLE-WRITER
    * cadences (a streaming pipeline's own maintenance slot — batches
    * are serial by construction); multi-writer deployments keep it
    * off and re-bucket at an orchestrated quiesce.
    */
  def compactIndex(spark: SparkSession, indexTable: String,
                   targetFiles: Int = 0, autoRebucket: Boolean = false,
                   postingsPerBucket: Long = DefaultPostingsPerBucket): Unit = {
    if (VersionedTable.latestVersion(indexTable) < 0) return
    // maintenance lease (VERDICT r13 missing #2): two concurrent
    // compactions would each pay a full O(index) rewrite and let the
    // conflict-checked commit pick a survivor at the end — serialize
    // LOUDLY at the door instead. Correctness never rested on this:
    // the RMW commits below stay conflict-checked regardless.
    graft.sources.MaintenanceLease.withLease(indexTable, "compactIndex") {
    val files =
      if (targetFiles > 0) targetFiles
      else math.max(1L,
        VersionedTable.read(spark, indexTable).count() / 200000L).toInt
    VersionedTable.compactBy(spark, indexTable)(df =>
      df.repartitionByRange(files, col("id")).sortWithinPartitions(col("id")))
    val pt = postingsTable(indexTable)
    val newNb =
      if (!autoRebucket) None
      else {
        require(postingsPerBucket >= 1,
          s"postingsPerBucket must be >= 1, got $postingsPerBucket")
        val cur = readPostingsBuckets(pt).getOrElse(DefaultPostingsBuckets)
        // fill target over the COMPACTED postings row count (one slim
        // count — this is already the amortized O(index) cadence)
        val rows =
          if (VersionedTable.latestVersion(pt) < 0) 0L
          else VersionedTable.read(spark, pt).count()
        // overflow-safe ceil-divide (rows + ppb - 1 can wrap for huge ppb)
        val need = if (rows == 0) 0L else (rows - 1) / postingsPerBucket + 1
        val want = math.min(MaxPayloadIdCollect.toLong,
          math.max(cur.toLong, need)).toInt
        if (want != cur) Some(want) else None
      }
    rebuildPostings(spark, indexTable, newBuckets = newNb)
    compactTokenFreq(spark, indexTable)
    }
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
    *
    * A prefix-token count table ([[tokenFreqTable]]) is maintained
    * beside the index under the SAME txn identity: +O(batch) partials
    * on ingest, hot-token detection reads the table — zero full-index
    * passes per ingest. Counts commit BEFORE the index so any crash
    * window leaves them ≥ the index's truth, and over-counts are
    * performance-safe (the hot set is a pure routing split — see
    * [[batchPairs]]). A legacy index with no count table falls back to
    * the one-shot recount; run [[rebuildTokenFreq]] once to migrate.
    * NOTE the hint's Σ-of-batch-maxes drift means long direct-call
    * ingest runs need a compaction cadence ([[streamingSink]] provides
    * one); this method self-heals by compacting when the hint has
    * crossed the hot cap and ≥16 appends have accumulated.
    *
    * The candidate join's index leg reads the POSTING-LIST sidecar
    * ([[postingsTable]]) pruned to the batch's token-hash buckets and
    * the verify stage reads only candidate ids' payload rows, so the
    * per-ingest index READ is O(matching buckets + candidates) — never
    * O(index). Postings commit AFTER the doc rows under the coverage
    * tag `(PostingsApp, docVersion)`; any gap (crash window, legacy
    * index) is healed by exploding exactly the uncovered doc commits —
    * and committed with the next fresh ingest, which is also how a
    * legacy index auto-migrates. For the parquet-side pruning to
    * engage, set `spark.sql.parquet.pushdown.inFilterThreshold` ≥
    * [[MaxPayloadIdCollect]] (reads stay correct without it, just
    * unpruned).
    *
    * CONCURRENT WRITERS (distinct `txnApp` streams racing on one
    * index) are safe but eventually-consistent for CROSS-writer dups:
    * the claimSlot retry means no commit is ever lost and the count
    * table converges to the final index's truth, but a writer only
    * sees a racing writer's docs if its pin landed after the other's
    * commit — two simultaneous copies can both report `kept` (each
    * is still indexed; the NEXT batch dedups against both). Replay
    * purity is per app stream: a replayed batch re-reports what ITS
    * pinned snapshot contains, which may include a racer that
    * committed inside the original run's window. The last-writer-wins
    * maxcnt hint can transiently under-count under races — routing-
    * only, never correctness (the lying-bounds spec). Spec: the
    * "concurrent multi-writer ingests" case in IncrementalDedupSpec.
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   textCol: String, idCol: String, indexTable: String,
                   threshold: Double, batchId: Long, n: Int = 3,
                   txnApp: Option[String] = None,
                   txn: Option[Long] = None): DataFrame = {
    val rows = indexRows(batch, textCol, idCol, threshold, n).localCheckpoint()

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
    val snap =
      if (ver < 0) None
      else Some(VersionedTable.readVersion(spark, indexTable, ver))

    // the count table, pinned by the same replay rule so its snapshot
    // matches the pinned index (a crash between the two commits can
    // only leave counts AHEAD — the performance-safe direction).
    // tf-side replay detection differs by path: fresh ingests use the
    // cheap per-app max-txn check (it can only cover our txn if THIS
    // txn's counts landed and the index commit then crashed — counts
    // commit first); REPLAYED ingests use exact membership on the tf
    // history (already paid for on the index side) — a pre-upgrade
    // batch, indexed before the count table existed, is absent from tf
    // even though later txns are present, and the max check would skip
    // its partials forever (ADVICE r11). Absent membership on replay
    // BACKFILLS the partials under the same (app, txn), making the
    // backfill itself idempotent on any further replay.
    val tf = tokenFreqTable(indexTable)
    // Self-healing hint drift (ADVICE r12): direct callers with no
    // compaction cadence let the Σ-of-batch-maxes hint drift past the
    // hot cap, silently disabling the zero-job provably-cold fast path.
    // When the hint has crossed the cap AND enough appends have
    // accumulated to amortize the fold, compact here — the exact reset
    // restores the fast path whenever the true max is still cold, and a
    // genuinely hot corpus (reset lands above the cap too) waits out
    // the next 16 appends before folding again.
    if (readMaxCntHint(tf).exists(_ > DefaultHotTokenCap)
        && VersionedTable.appendsSinceOverwrite(tf) >= 16)
      compactTokenFreq(spark, indexTable)
    // materialized lazily: the index-replay path already paid for the
    // walk; the FRESH path needs it only in the counts-landed-index-
    // crashed retry window (tfReplayed via txnMaxes while replayed is
    // false) — calling .get on a None here wedged that designed
    // recovery path with a NoSuchElementException on every retry
    lazy val tfHistoryAll = VersionedTable.history(tf)
    val tfReplayed =
      if (replayed) txnApp.zip(txn).exists { case (app, t) =>
        tfHistoryAll.exists(c => c.txnApp.contains(app) && c.txn.contains(t))
      } else txnApp.zip(txn).exists { case (app, t) =>
        VersionedTable.txnMaxes(tf).get(app).exists(_ >= t)
      }
    val tfLatest = VersionedTable.latestVersion(tf)
    val tfVer = (if (!tfReplayed) None
      else txnApp.zip(txn).flatMap { case (app, t) =>
        tfHistoryAll
          .find(c => c.txnApp.contains(app) && c.txn.contains(t))
          .map(_.version - 1)
      }).getOrElse(tfLatest)

    // ONE pass over the batch's prefix tokens, shared by hot-token
    // detection and the partials commit (r11 computed it twice). The
    // partials COMMIT happens here, before the pair pass — same
    // crash-safe order as before (counts land ahead of the index; a
    // failed ingest retries with the txn guard, and an untagged retry
    // merely over-counts, the performance-safe direction) — so the
    // batch's max token count falls out of the commit's own write via
    // observe(): zero extra jobs on the ingest path. The sidecar hint
    // is bumped BEFORE the commit with the trivial bound (cnt ≤ batch
    // rows: a token appears at most once per doc prefix) and tightened
    // to the observed max right after — hint ≥ truth at every crash
    // point.
    // checkpointed: the SAME materialized counts serve the tf commit,
    // the replay-path max agg, AND batchPairs' semi-join build side /
    // hot-detection batchFreq — without this the explode+groupBy over
    // the batch's prefix tokens re-ran inside each consumer (up to 3x
    // O(batch-tokens) on the hot path)
    val bc = batchTokenCounts(rows).localCheckpoint()
    val hint = readMaxCntHint(tf)
    val nRows = rows.count() // local scan of the checkpoint
    val batchMax: Long =
      if (!tfReplayed) {
        // per-writer hint file ([[bumpOwnHint]]): monotonic across
        // concurrent writers — a racer can only RAISE the global max
        (if (tfLatest < 0) Some(nRows) else hint.map(_ + nRows))
          .foreach(bumpOwnHint(tf, _))
        val obs = org.apache.spark.sql.Observation()
        VersionedTable.commit(
          bc.observe(obs, coalesce(max(col("cnt")), lit(0L)).as("mx"))
            .withColumn("batch", lit(batchId)),
          tf, "append", txn, txnApp, expectedVersion = None)
        val mx = obs.getAsJava.get("mx").asInstanceOf[Long]
        (if (tfLatest < 0) Some(mx) else hint.map(_ + mx))
          .foreach(bumpOwnHint(tf, _))
        mx
      } else { // replay: no commit to observe — one tiny agg instead
        bc.agg(coalesce(max(col("cnt")), lit(0L))).head().getLong(0)
      }
    val hotIn = HotInputs(batchFreq = Some(bc),
      batchMaxFreq = Some(batchMax),
      indexMaxCnt = if (snap.isEmpty) Some(0L) else hint)
    // same bound batchPairs re-checks; a divergence only costs the
    // recount fallback, never a wrong answer
    val provablyCold =
      if (snap.isEmpty) batchMax <= DefaultHotTokenCap
      else hint.exists(_ + batchMax <= DefaultHotTokenCap)
    val idxCnt =
      if (provablyCold || snap.isEmpty || tfVer < 0) None
      else Some(tokenCounts(spark, indexTable, Some(tfVer)))

    // The index side of the candidate join: the POSTINGS sidecar read
    // pruned to the batch's token-hash buckets (plus a heal explode of
    // any doc commits the sidecar doesn't cover yet — crash windows and
    // legacy-index auto-migration), never a full posexplode of the doc
    // table. The payload (sh, shh) verify read is candidate-pruned
    // (prunePayload — see [[finishPairs]]). Together the per-ingest
    // index READ is O(matching buckets + candidates): the r12 O(index)
    // slim-column scan floor is gone.
    val pt = postingsTable(indexTable)
    val nb = readPostingsBuckets(pt).getOrElse(DefaultPostingsBuckets)
    val indexSide = snap.map(s =>
      indexSideFor(spark, indexTable, ver, s, bc, nRows, pt, nb))
    if (snap.isEmpty) { lastIndexTok = None; lastPayloadIdx = None }


    // within-batch AND vs-index pairs in ONE candidate+verify pass,
    // from the SAME checkpointed signature rows the index append uses —
    // the batch is shingled exactly once per ingest, and the pair pass
    // is checkpointed so the cluster step and the status join don't
    // re-run it
    val pairs = pairsImpl(rows, indexSide, threshold, DefaultHotTokenCap,
      DefaultHotChunk, DefaultMaxHotCollect, idxCnt, hotIn).localCheckpoint()
    val within = pairs.filter(col("within"))
      .select(col("id_new").as("id_a"), col("id_old").as("id_b"))
    // Within-batch components ([[componentsOf]]: bounded driver
    // union-find, distributed star fallback). `pairs` is checkpointed,
    // so the gate probe is a cheap local scan.
    val comp = componentsOf(spark, rows.select(col("id")), within)
    val dupIdx = pairs.filter(!col("within"))
      .select(col("id_new")).distinct()

    // counts committed FIRST (above, fused with the batch-max
    // observation), then the index, then the postings sidecar: a crash
    // between any two leaves counts over the index (performance-safe)
    // and postings BEHIND the doc log (heal-read covers the gap — the
    // reverse order could let a candidate read see postings for docs
    // not in its pinned snapshot).
    // file count proportional to DATA, not to the session's parallelism:
    // a modest batch written as 32 near-empty files makes every later
    // ingest's snapshot read pay O(total files) in listings and footer
    // opens — the classic small-files ramp. ~200k signature rows
    // (~300 MB at ~1.5 KB/row of shingle arrays) per file. Sorted by id
    // within each file so the candidate-pruned verify fetch's In(id)
    // pushdown skips row groups via tight id stats.
    if (!replayed) {
      val v1 = VersionedTable.commit(
        rows.coalesce(math.max(1L, nRows / 200000L).toInt)
          .sortWithinPartitions(col("id"))
          .withColumn("batch", lit(batchId)),
        indexTable, "append", txn, txnApp, expectedVersion = None)
      // Postings for THIS batch plus any uncovered gap strictly below
      // v1 at this moment (a prior writer's crash window, or the whole
      // history of a legacy index = lazy auto-migration). Claiming
      // coverage v1 is then sound by induction: every doc version ≤ v1
      // has posting rows once this commit lands. Racing writers may
      // duplicate a gap's rows — duplicates collapse in the candidate
      // groupBy, so that costs storage in a rare window, never
      // correctness; compaction folds them away.
      if (readPostingsBuckets(pt).isEmpty) writePostingsBuckets(pt, nb)
      val coveredNow = VersionedTable.txnMaxes(pt)
        .get(PostingsApp).getOrElse(-1L)
      val gap = healPostings(spark, indexTable, nb, coveredNow, v1,
        belowVer = Some(v1))
      val own = postingsFor(rows, nb, v1)
      VersionedTable.commit(
        clusterPostings(gap.map(own.unionByName).getOrElse(own), nRows * 8),
        pt, "append", Some(v1), Some(PostingsApp), expectedVersion = None)
    }

    val dup = dupIdx.withColumn("__dup", lit(true))
    comp.join(dup, comp("id") === dup("id_new"), "left")
      .select(comp("id"), lit(batchId).as("batch"),
        when(col("__dup"), lit("dup_of_index"))
          .when(comp("id") === col("cluster"), lit("kept"))
          .otherwise(lit("dup_within_batch")).as("status"))
  }

  /** Min-id component labels for `ids` under `edges` (`id_a, id_b`) —
    * the within-batch clustering shared by [[processBatch]] and
    * [[IncrementalMinHash.processBatch]]. A batch's VERIFIED
    * duplicate-pair set is usually tiny; below the bound (collect ≤
    * 2^20 pairs = 16 MB — a stated-bound driver collect, like every
    * other one in this repo) a driver union-find with min-root
    * attachment replaces ~10 tiny distributed rounds; past the bound
    * the O(log n) large-star/small-star path takes over unchanged.
    * ONE bounded job decides the path AND fetches the edges: collect
    * at most bound+1 rows — fits ⇒ those are all the edges; overflow
    * ⇒ discard and take the distributed route (callers checkpoint the
    * pairs, so the gate probe is a cheap local scan).
    */
  private[graft] def componentsOf(spark: SparkSession, ids: DataFrame,
                                  edges: DataFrame): DataFrame = {
    val maxDriverEdges = 1 << 20
    val head = edges.limit(maxDriverEdges + 1).collect()
    if (head.length <= maxDriverEdges) {
      val es = head.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // larger root attaches under smaller ⇒ every root IS its
        // component's min id
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val sp = spark; import sp.implicits._
      val labels = members.map(m => (m, find(m))).toSeq.toDF("id", "cluster")
      ids.join(broadcast(labels), Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    } else Dedup.clustersStar(ids, edges, "id", "id_a", "id_b")
  }

  /** The index side of one batch's candidate+verify pass against a
    * persisted index pinned at `ver` — shared by [[processBatch]]
    * (ingest) and [[lookupPairs]] (read-only query). `s` is the pinned
    * doc snapshot, `bc` the batch's checkpointed token counts, `nRows`
    * the batch's row count (the regime gates key on it).
    */
  private def indexSideFor(spark: SparkSession, indexTable: String,
                         ver: Long, s: DataFrame, bc: DataFrame,
                         nRows: Long, pt: String, nb: Int): IndexSide = {
    // Bucket pruning only bites when the batch's vocabulary covers a
    // FRACTION of the bucket space — coupon-collector: a batch with
    // ≥ nb/4 docs (each contributing ≥1 hash-uniform prefix token)
    // already hits nearly every bucket, so collecting its bucket set
    // would cost one job to prune nothing. Bulk ingests therefore
    // skip the collect and read the slim postings whole (exact — the
    // filter is performance-only, derived from the batch vocab);
    // trickle ingests — the regime the pruning exists for — pay one
    // bounded collect (≤ nb ints) and push the bucket set to the
    // scan.
    val batchBuckets: Option[Seq[Int]] =
      if (nRows > nb / 4) None
      else Some(bc
        .select(pmod(xxhash64(col("g")), lit(nb)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq)
    val covered = VersionedTable.txnMaxes(pt)
      .get(PostingsApp).getOrElse(-1L)
    // REBUILD FLOOR (r13 review finding): a rebuild/compaction
    // overwrites the postings with rows all tagged v = the rebuild's
    // doc version, so a read PINNED BELOW that version sees nothing —
    // the original per-commit rows left the replay closure with the
    // overwrite. The floor is the base overwrite's coverage tag;
    // pins under it must ignore the postings and heal the whole
    // pinned closure (the documented time-travel-after-compaction
    // cost: correct, just unpruned). Without this gate a replayed
    // batch below a compaction got an EMPTY index leg and silently
    // re-statused its dups as kept.
    val ptLatest = VersionedTable.latestVersion(pt)
    val rebuildFloor =
      if (ptLatest < 0) -1L
      else VersionedTable.snapshotClosure(pt, ptLatest)
        .headOption.filter(_.mode == "overwrite")
        .flatMap(_.txn).getOrElse(-1L)
    val postingsUsable = ptLatest >= 0 && ver >= rebuildFloor
    val fromPostings =
      if (!postingsUsable) None
      else Some {
        // pinned at ptLatest, NOT latest-at-read: rebuildFloor was
        // computed from ptLatest's closure, and an unpinned read lets a
        // rebuild/compaction overwrite land between the two — its rows
        // all retagged v = the rebuild's doc version, so a reader
        // pinned below would filter out EVERY posting while its (stale)
        // floor still said the postings were usable: an empty index leg
        // and silently re-kept dups. Pinning makes floor and rows
        // describe the same snapshot under any interleaving.
        val p = VersionedTable.readVersion(spark, pt, ptLatest)
        // v <= ver: snapshot purity (excludes racing writers' newer
        // postings and a replayed batch's own rows); b IN buckets:
        // the pushed row-group prune. Empty batch reads nothing.
        (batchBuckets match {
          case Some(bs) if bs.isEmpty => p.filter(lit(false))
          case Some(bs) => p.filter(col("v") <= lit(ver)
            && col("b").isin(bs: _*))
          case None => p.filter(col("v") <= lit(ver))
        })
          .select(col("id").as("id_old"), col("sz").as("sz_old"),
            col("po"), col("g"))
      }
    val heal =
      if (postingsUsable && covered >= ver) None
      else healPostings(spark, indexTable, nb,
          aboveCovered = if (postingsUsable) covered else -1L, ver)
        .map(_.select(col("id").as("id_old"), col("sz").as("sz_old"),
          col("po"), col("g")))
    val tok = (fromPostings.toSeq ++ heal.toSeq)
      .reduceOption(_.unionByName(_))
      // unreachable in practice (covered >= ver implies a postings
      // table exists); the posexplode fallback keeps it exact anyway
      .getOrElse(s.select(col("id").as("id_old"), col("sz").as("sz_old"),
        posexplode(col("prefix")).as(Seq("po", "g"))))
    lastIndexTok = Some(tok)
    // Payload pruning is a TRICKLE-regime device, gated on batch
    // size like the bucket probe: its candidate materialization (one
    // bounded collect) is cheap exactly when the batch — and hence
    // the candidate DAG — is small, and that is also the regime
    // where its prize (zero payload bytes for a clean small ingest
    // against a huge index) matters. A bulk batch would pay the
    // materialization only to blow past the 1024-id pushdown bound
    // and fall back to the full payload fetch anyway (measured:
    // +~1.2 s/ingest at sf0.1 bulk for zero pruning) — it keeps the
    // r12-shaped fused lazy plan, whose one payload scan amortizes
    // over the bulk batch's own O(batch) work.
    IndexSide(tok = tok,
      payload = s.select(col("id"), col("sh"), col("shh")),
      prunePayload = nRows <= MaxPayloadIdCollect)
    }

  /** Read-only near-duplicate LOOKUP against a persisted index — the
    * query-time face of the posting-list layout: "is this document (or
    * small probe batch) already in the corpus?" without committing
    * anything. Runs [[processBatch]]'s exact candidate+verify pass
    * (postings bucket-pruned, payload candidate-pruned — a small probe
    * is the trickle regime by construction, so the index READ is
    * O(matching buckets + candidates)) over the index pinned at
    * `version` (default: latest, resolved eagerly — the result is
    * stable under later ingests). Output: `id_new` (probe doc),
    * `id_old` (indexed doc), `jaccard` for every pair with exact
    * Jaccard ≥ t. Probe-internal pairs are not reported — this is a
    * lookup, not a dedup. No table is written: the index, tf sidecar
    * and postings are untouched (spec-pinned).
    */
  def lookupPairs(spark: SparkSession, indexTable: String, probe: DataFrame,
                  textCol: String, idCol: String, threshold: Double,
                  n: Int = 3, version: Option[Long] = None): DataFrame = {
    val ver = version.getOrElse(VersionedTable.latestVersion(indexTable))
    if (ver < 0) {
      val sp = spark; import sp.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("id_new", "id_old", "jaccard")
    }
    val rows = indexRows(probe, textCol, idCol, threshold, n).localCheckpoint()
    val bc = batchTokenCounts(rows).localCheckpoint()
    val nRows = rows.count()
    val snap = VersionedTable.readVersion(spark, indexTable, ver)
      .select(col("id"), col("sz"), col("sh"), col("shh"), col("prefix"))
    val pt = postingsTable(indexTable)
    val nb = readPostingsBuckets(pt).getOrElse(DefaultPostingsBuckets)
    val is = indexSideFor(spark, indexTable, ver, snap, bc, nRows, pt, nb)
    // read-only hot inputs: no commit to observe, so the batch max is
    // one tiny agg over the checkpointed counts; the maintained count
    // table serves index-side frequencies exactly as in ingest
    val tf = tokenFreqTable(indexTable)
    val hint = readMaxCntHint(tf)
    val batchMax = bc.agg(coalesce(max(col("cnt")), lit(0L))).head().getLong(0)
    val hotIn = HotInputs(batchFreq = Some(bc),
      batchMaxFreq = Some(batchMax), indexMaxCnt = hint)
    val provablyCold = hint.exists(_ + batchMax <= DefaultHotTokenCap)
    val idxCnt =
      if (provablyCold || VersionedTable.latestVersion(tf) < 0) None
      else Some(tokenCounts(spark, indexTable))
    pairsImpl(rows, Some(is), threshold, DefaultHotTokenCap,
        DefaultHotChunk, DefaultMaxHotCollect, idxCnt, hotIn)
      .filter(!col("within"))
      .select(col("id_new"), col("id_old"), col("jaccard"))
  }

  /** Structured Streaming ingest-dedup: each micro-batch runs
    * [[processBatch]] against the persisted index with `(appId,
    * batchId)` txn identity, so a checkpoint replay after a crash
    * re-reports statuses (pinned below the original commit — pure) but
    * the index gains no second copy. Statuses land hive-partitioned by
    * `__batch` with dynamic partition overwrite (the
    * [[graft.streaming.StreamingOps.partitionOverwriteSink]] recipe):
    * a replayed batch rewrites exactly its own partition, so BOTH sides
    * of the sink — index and results — are exactly-once.
    *
    * This is the streaming face of the ingest operating mode: the
    * pipeline dedupes forever without ever recomputing a previous
    * batch's signatures. Read the cumulative decisions from
    * `resultsDir`; the kept corpus is `status = 'kept'` joined back to
    * the upstream doc store (this sink persists decisions, not text).
    */
  def streamingSink(docs: DataFrame, textCol: String, idCol: String,
                    indexTable: String, resultsDir: String, appId: String,
                    threshold: Double, n: Int = 3)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        processBatch(s, batch, textCol, idCol, indexTable, threshold,
            batchId, n, txnApp = Some(appId), txn = Some(batchId))
          .withColumn("__batch", lit(batchId))
          .write.mode("overwrite").partitionBy("__batch").parquet(resultsDir)
        // fold the count partials periodically so hot detection keeps
        // reading O(distinct tokens), not O(batches x tokens). RMW-safe
        // and semantically idempotent, so a replayed batch re-compacting
        // is harmless
        if (batchId % 64 == 63) compactTokenFreq(s, indexTable)
    }
}
