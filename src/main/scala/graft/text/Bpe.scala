package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training and application —
  * the vocabulary-learning step of an LLM data pipeline (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"; the reference pipeline tokenizes with a fixed regex only,
  * `etl.py` has no subword stage).
  *
  * Scale design: the corpus is collapsed ONCE to the (word, count)
  * vocabulary table — for a 100 TB corpus that is a few million rows,
  * orders of magnitude smaller than the document table — and every
  * merge iteration runs on that table alone: one explode + map-side-
  * combined hash aggregate to count adjacent symbol pairs (pair-vocab-
  * sized shuffle), one 1-row driver collect for the argmax (bounded by
  * construction), one array fold to apply the merge. The corpus itself
  * is never rescanned after the initial word count. Lineage is cut
  * with localCheckpoint every few merges, the same discipline as
  * [[graft.dedup.Dedup]]'s iterative connected components.
  *
  * Merge application is a left-to-right non-overlapping fold
  * (canonical BPE greedy semantics): `aggregate(syms, [], (out, x) ->
  * if last(out)==a && x==b then replace-last(a||b) else append(x))`.
  * The lambda HOF is interpreted (Spark HOFs are CodegenFallback), but
  * it runs over the vocabulary table, not the corpus, so the
  * interpreted cost is bounded by vocab size × merge count.
  *
  * `mergesPerRound > 1` enables BATCHED merging: the top-k pairs of a
  * round are applied together when they are symbol-disjoint (no token
  * shared between two chosen pairs). Symbol-disjointness makes the
  * applications position-disjoint, so within a batch the order of
  * application cannot change the result; the batch is still an
  * APPROXIMATION of canonical BPE (a merge can create a brand-new pair
  * whose count exceeds a later pick of the same round). This is the
  * standard fast-BPE trade (k× fewer Spark jobs for a slightly
  * different merge order deep in the tail); batch=1 is exact.
  */
object Bpe {

  /** End-of-word marker appended as a separate symbol, so merges can
    * learn suffixes without crossing word boundaries. */
  val EndOfWord = "</w>"

  /** Corpus → (word, cnt) vocabulary table with the initial
    * character-level symbol array (plus [[EndOfWord]]). One corpus
    * scan, one hash aggregate; everything downstream is vocab-sized. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat(split(col("word"), ""), array(lit(EndOfWord))))

  /** Adjacent symbol-pair counts over a word table, weighted by word
    * count. `transform(sequence(...))` builds the per-word pair list
    * without a join; the aggregate collapses map-side before the one
    * pair-vocab-sized shuffle. Output: a, b, pair_cnt. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(expr(
          "transform(sequence(0, size(syms) - 2)," +
            " i -> struct(syms[i] as a, syms[i + 1] as b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("pair_cnt"))

  /** One left-to-right non-overlapping application of merge (a, b) to
    * the symbol array column `symsCol`. Greedy fold, canonical BPE
    * semantics. */
  private def applyMerge(symsCol: String,
                         a: String, b: String): org.apache.spark.sql.Column = {
    val esc = (s: String) => s.replace("\\", "\\\\").replace("'", "\\'")
    expr(
      s"""aggregate($symsCol,
         |  cast(array() as array<string>),
         |  (out, x) -> if(size(out) > 0
         |       and element_at(out, -1) = '${esc(a)}' and x = '${esc(b)}',
         |     concat(slice(out, 1, size(out) - 1),
         |            array('${esc(a)}${esc(b)}')),
         |     concat(out, array(x))))""".stripMargin)
  }

  /** Train `nMerges` BPE merges over `df`'s `textCol`. Returns the
    * merge table: rank (1-based), left, right, pair_cnt (the count at
    * the time the merge was chosen). Ties on count break
    * lexicographically on (left, right) — a total order, so training
    * is deterministic across runs and partitionings.
    *
    * Driver traffic: one 1-row (or `mergesPerRound`-row) collect per
    * round — bounded by construction, never data-scaled.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            mergesPerRound: Int = 1,
            checkpointEvery: Int = 8): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(mergesPerRound > 0, s"mergesPerRound must be positive")
    val spark = df.sparkSession
    var words = wordTable(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var sinceCheckpoint = 0
    while (merges.length < nMerges) {
      val want = math.min(mergesPerRound, nMerges - merges.length)
      // Collect enough top pairs to find `want` symbol-disjoint ones:
      // 4× over-fetch is a heuristic, bounded constant either way.
      val top = pairCounts(words)
        .orderBy(col("pair_cnt").desc, col("a"), col("b"))
        .limit(math.max(want * 4, 8))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) {
        // Every word is a single symbol — nothing left to merge.
        return mergesDf(spark, merges.toSeq)
      }
      val used = scala.collection.mutable.Set.empty[String]
      val batch = top.filter { case (a, b, _) =>
        val ok = !used.contains(a) && !used.contains(b)
        if (ok) { used += a; used += b }
        ok
      }.take(want)
      batch.foreach { case (a, b, c) =>
        merges += ((merges.length + 1, a, b, c))
      }
      val merged = batch.foldLeft(words) { case (w, (a, b, _)) =>
        w.withColumn("syms", applyMerge("syms", a, b))
      }
      sinceCheckpoint += 1
      words =
        if (sinceCheckpoint >= checkpointEvery) {
          sinceCheckpoint = 0
          merged.localCheckpoint()
        } else merged
    }
    mergesDf(spark, merges.toSeq)
  }

  private def mergesDf(spark: SparkSession,
                       ms: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    ms.toDF("rank", "left", "right", "pair_cnt")
      .select(col("rank").cast("long"), col("left"), col("right"),
        col("pair_cnt"))
  }

  /** Apply a trained merge list to a word table, cutting lineage every
    * `checkpointEvery` merges — the SAME discipline as [[train]]'s
    * loop. Without the cuts the folds stack into one deep interpreted
    * expression chain whose analysis+evaluation cost grows with merge
    * count (measured 14 s for a 10-merge chain at sf0.1 vs ~1 s cut;
    * a 50k-merge production vocabulary would be unusable). */
  def applyMerges(words: DataFrame, mergeRows: Seq[(String, String)],
                  checkpointEvery: Int = 8): DataFrame =
    mergeRows.zipWithIndex.foldLeft(words) {
      case (w, ((a, b), k)) =>
        val merged = w.withColumn("syms", applyMerge("syms", a, b))
        if ((k + 1) % checkpointEvery == 0) merged.localCheckpoint()
        else merged
    }

  /** The subword vocabulary a tokenizer ships: apply `mergeRows` to the
    * word table, explode the surviving symbols, and count occurrences
    * weighted by word frequency. Output: sym, n_occurrences (long) —
    * symbol-vocab-sized end to end. */
  def vocabulary(df: DataFrame, textCol: String,
                 mergeRows: Seq[(String, String)]): DataFrame =
    applyMerges(wordTable(df, textCol), mergeRows)
      .select(col("cnt"), explode(col("syms")).as("sym"))
      .groupBy(col("sym"))
      .agg(sum(col("cnt")).as("n_occurrences"))

  /** Tokenize `textCol` with a trained merge table: rebuild the word
    * table, apply the merges in rank order (vocab-sized work), then
    * BROADCAST the (word → n_subwords, joined subwords) map back
    * against the exploded corpus. Output: idCol, n_words, n_subwords,
    * subword_ratio — the compression diagnostic that decides whether a
    * vocab is worth shipping. */
  def tokenStats(df: DataFrame, textCol: String, idCol: String,
                 mergeRows: Seq[(String, String)]): DataFrame = {
    val words = applyMerges(wordTable(df, textCol), mergeRows)
      .select(col("word"),
        size(col("syms")).cast("long").as("n_subwords_w"))
    df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(words), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subwords_w")).as("n_subwords"))
      .select(col(idCol), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6).as("subword_ratio"))
  }
}
