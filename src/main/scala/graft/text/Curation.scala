package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: span-level dedup inside a document, linear
  * quality-classifier inference, temperature-scaled source mixing, and
  * unigram-LM log-probability scoring (the cheap perplexity proxy).
  *
  * All four are pure dataflow — no driver-side loops, no UDFs; every
  * expression is a codegen'd built-in, and each operator's shuffle
  * count is fixed (1–2) regardless of corpus size.
  */
object Curation {

  /** Remove repeated spans inside each document, keeping the FIRST
    * occurrence and preserving original order — the intra-document half
    * of Common-Crawl-style dedup (on a newline corpus `sep="\n"` makes
    * this exact duplicate-line removal; the testdata corpus is
    * single-line, so the harness query runs it at token granularity,
    * same dataflow).
    *
    * Shape: posexplode → min(pos) per (doc, span) → ordered reassembly.
    * One explicit repartition on the doc id serves BOTH aggregate
    * levels (hash clustering on a key-prefix satisfies the (doc, span)
    * distribution too — the [[TextFns.tokenEntropy]] single-exchange
    * pattern): one shuffle round instead of two, and it runs BEFORE the
    * explode, so the exchange carries each document's text once (one
    * row per doc) instead of its span rows — strictly less data and per
    * -row overhead than either exploded-side alternative. Per-group state is bounded by
    * document size (a document that doesn't fit in an aggregation
    * buffer has no business in a training corpus — enforce with a
    * length gate upstream). Output: idCol, `text_dedup`, `n_spans`,
    * `n_kept`.
    */
  def firstOccurrenceDedup(df: DataFrame, textCol: String, idCol: String,
                           sep: String = " "): DataFrame = {
    val first = df
      .select(col(idCol), col(textCol))
      .repartition(col(idCol)) // shuffle whole docs (one row each), explode after
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .groupBy(col(idCol), col("col").as("span"))
      .agg(min(col("pos")).as("__fp"), count(lit(1)).as("__n"))
    first
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__fp"), col("span")))),
            x => x.getField("span")),
          sep).as("text_dedup"),
        sum(col("__n")).as("n_spans"),
        count(lit(1)).as("n_kept"))
  }

  /** Linear quality-classifier inference: score = sigmoid(w · x + b)
    * over in-plan text features. The model (weights + bias) is a plain
    * Scala map compiled INTO the expression tree — the 100 TB shape for
    * "run a small quality model over every document": no shuffle at
    * all, the whole thing is scan-stage column arithmetic inside one
    * WholeStageCodegen span, exactly what a broadcast of a small model
    * degenerates to when the model fits in the plan.
    *
    * Features (all derived from `textCol`, names are the map keys):
    * `n_tokens`, `avg_token_len`, `distinct_ratio` (type–token ratio),
    * `stopword_ratio` (share of tokens in `stopwords`).
    */
  def scoreLinear(df: DataFrame, textCol: String, idCol: String,
                  weights: Map[String, Double], bias: Double,
                  stopwords: Seq[String]): DataFrame =
    df.select(col(idCol),
      scoreCol(col(textCol), weights, bias, stopwords).as("quality_score"))

  /** The bare scoring COLUMN of [[scoreLinear]] — compose it into a plan
    * that already carries the text instead of joining the (id, score)
    * table back by id: an in-plan expression costs nothing extra where a
    * self-join on the id would re-shuffle the corpus.
    */
  def scoreCol(text: Column, weights: Map[String, Double], bias: Double,
               stopwords: Seq[String]): Column = {
    require(stopwords.nonEmpty, "stopwords must be non-empty")
    val toks = split(text, " ")
    val nTok = size(toks).cast("double")
    val features: Map[String, Column] = Map(
      "n_tokens" -> nTok,
      "avg_token_len" ->
        (length(text) - (nTok - 1)).cast("double") / nTok,
      "distinct_ratio" -> size(array_distinct(toks)).cast("double") / nTok,
      "stopword_ratio" ->
        size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*))).cast("double") / nTok)
    val unknown = weights.keySet -- features.keySet
    require(unknown.isEmpty, s"unknown feature(s): ${unknown.mkString(", ")}")
    // fold in sorted-key order: double addition is order-sensitive, and a
    // fixed order keeps the score bit-reproducible across runs/engines
    val z = weights.toSeq.sortBy(_._1).foldLeft(lit(bias)) { case (acc, (name, w)) =>
      acc + features(name) * lit(w)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Temperature-scaled mixture weights (the multinomial-sampling
    * formula from multilingual/multi-source LM training: p_i ∝ n_i^α,
    * α ∈ (0, 1] flattens the source distribution). Output per group:
    * `n_docs`, `natural_share`, `mix_weight` (= n^α / Σ n^α), and
    * `sample_rate` — the per-document keep probability that realizes
    * the mixture from the natural distribution, normalized so the most
    * oversampled group keeps 100 % (no replication, only down-sampling).
    *
    * One count-aggregate (group cardinality rows, tiny), then a 1-row
    * cross join for the normalizers — broadcast at any corpus size.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(
      sum(col("n_docs")).as("__tot"),
      sum(pow(col("n_docs"), lit(alpha))).as("__totA"),
      // max over groups of (n^α / n) — the most-oversampled group's
      // unnormalized rate; dividing by it caps sample_rate at 1.0
      max(pow(col("n_docs"), lit(alpha)) / col("n_docs")).as("__maxR"))
    counts.crossJoin(totals)
      .select(col(groupCol), col("n_docs"),
        round(col("n_docs") / col("__tot"), 6).as("natural_share"),
        round(pow(col("n_docs"), lit(alpha)) / col("__totA"), 6).as("mix_weight"),
        round((pow(col("n_docs"), lit(alpha)) / col("n_docs")) / col("__maxR"), 6)
          .as("sample_rate"))
  }

  /** Token-budget allocation — the step after [[temperatureWeights]] in
    * assembling a training mix: given a total token budget and the
    * temperature-scaled mixture, how many tokens to draw from each
    * source and what that means operationally (an `epochs` factor > 1 is
    * repetition, < 1 is subsampling; `sample_rate` caps at 1 — this
    * operator never fabricates data, it reports the repetition factor
    * and lets the training loader decide how to realize it).
    *
    * Output per group: `n_tokens` (natural supply), `mix_weight`
    * (∝ n_tokens^α), `target_tokens` (budget share, floored),
    * `epochs` (target/supply), `sample_rate` (min(1, epochs)). Same
    * scale shape as temperatureWeights: one count aggregate to group
    * cardinality, one 1-row cross join — nothing corpus-sized moves.
    */
  def tokenBudget(df: DataFrame, groupCol: String, textCol: String,
                  alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val counts = df.groupBy(col(groupCol))
      .agg(sum(size(split(col(textCol), " "))).as("n_tokens"))
    val totals = counts.agg(sum(pow(col("n_tokens"), lit(alpha))).as("__totA"))
    counts.crossJoin(totals)
      .select(col(groupCol), col("n_tokens"),
        round(pow(col("n_tokens"), lit(alpha)) / col("__totA"), 6).as("mix_weight"),
        floor(lit(budgetTokens.toDouble)
          * (pow(col("n_tokens"), lit(alpha)) / col("__totA"))).cast("long")
          .as("target_tokens"))
      .withColumn("epochs",
        round(col("target_tokens").cast("double") / col("n_tokens") + lit(1e-12), 6))
      .withColumn("sample_rate", least(lit(1.0), col("epochs")))
  }

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram LM — the classic cheap perplexity proxy for quality
    * filtering (documents of rare/garbage tokens score low; boilerplate
    * scores high).
    *
    * Scale shape: (1) token counts — explode collapses to per-partition
    * partials before one shuffle on token; (2) per-doc term counts join
    * the token distribution ON TOKEN (shuffle join: at 100 TB the
    * unigram table is too big to broadcast; hot-token skew is bounded
    * because the probe side is pre-aggregated to (doc, token) — a token
    * appears once per containing doc, not once per occurrence); (3)
    * re-group on doc id for the weighted mean. Output: idCol,
    * `n_tokens`, `mean_logp` (natural log, rounded).
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    val termCounts = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tc"))
    val unigram = toks.groupBy(col("token")).agg(count(lit(1)).as("cf"))
    val total = unigram.agg(sum(col("cf")).as("__N"))
    termCounts.join(unigram, "token").crossJoin(total)
      .groupBy(col(idCol))
      .agg(
        sum(col("tc")).as("n_tokens"),
        round(sum(col("tc") * log(col("cf").cast("double") / col("__N")))
          / sum(col("tc")), 6).as("mean_logp"))
  }

  /** Cross-document span-sharing stats — the exact-substring-dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): for each document, how much of it is
    * token n-gram spans that also occur in OTHER documents, and whether
    * this document is the canonical (min-id) owner of those shared
    * spans. [[firstOccurrenceDedup]] is the within-document half;
    * `dedupCorpus` in [[graft.dedup.Dedup]] is whole-document — this is
    * the between-documents, sub-document granularity that catches
    * boilerplate headers, quoted passages, and license blocks that
    * doc-level Jaccard dilutes below threshold.
    *
    * Shape: per-doc rolling n-gram fingerprints (xxhash64 over the
    * joined token window — one codegen'd projection, no shuffle), ONE
    * exchange on the fingerprint that serves both the (gram, doc) count
    * aggregate and the per-gram window (docs-per-gram + min-id owner —
    * the [[TextFns.tokenEntropy]] shared-exchange idiom), then a
    * re-group on the doc id. A boilerplate gram occurring in m docs
    * contributes m (gram, doc) rows — linear, never m²/2 pairs: stats
    * aggregate where pair generators blow up, so no DF cap is needed
    * and the counts stay exact; WindowExec spills rather than buffering
    * a hot gram's group. Documents shorter than n tokens have no
    * n-gram and are absent from the output (their dup fraction is
    * undefined, not zero).
    *
    * Output per doc: `n_grams` (token windows), `n_dup_grams` (windows
    * whose gram occurs in ≥ 2 docs), `n_owned_dup` (dup windows this
    * doc canonically owns — subtract to get what a remove-all-but-one
    * pass would cut), `dup_frac` (= n_dup_grams/n_grams, the fraction
    * Lee et al. threshold on; +1e-12 before rounding — 2^k gram counts
    * land exact decimal ties on the 7th digit, the PageRank tie-break
    * idiom).
    */
  def crossDocSpanStats(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 8, sep: String = " "): DataFrame = {
    val marked = markedGrams(df, textCol, idCol, n, sep)
      .groupBy(col("g"), col("id"))
      .agg(count(lit(1)).as("cnt"),
        first(col("ndocs")).as("ndocs"), first(col("owner")).as("owner"))
    val dup = when(col("ndocs") > 1, col("cnt"))
    marked.groupBy(col("id"))
      .agg(
        sum(col("cnt")).as("n_grams"),
        coalesce(sum(dup), lit(0L)).as("n_dup_grams"),
        coalesce(sum(when(col("ndocs") > 1 && col("owner") === col("id"),
          col("cnt"))), lit(0L)).as("n_owned_dup"))
      .withColumn("dup_frac",
        round(col("n_dup_grams").cast("double") / col("n_grams") + lit(1e-12), 6))
  }

  /** Shared stage of [[crossDocSpanStats]] / [[crossDocSpanDedup]]:
    * every rolling n-gram window as (id, pos, g) with its cross-corpus
    * `ndocs` (distinct docs containing the gram) and `owner` (min doc
    * id) attached. One exchange on the fingerprint serves the
    * per-(g, id) first-row marker AND both per-gram windows.
    */
  private def markedGrams(df: DataFrame, textCol: String, idCol: String,
                          n: Int, sep: String): DataFrame = {
    require(n >= 2, s"span n-grams need n >= 2, got $n")
    val t = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val grams = df
      .select(col(idCol).cast("long").as("id"), t.as("t"))
      // short docs excluded INSIDE the explode (empty array → no rows):
      // a `size(t) >= n` filter here would be predicate-pushed below
      // the Project and re-evaluate the split per doc (the signature
      // double-eval pattern); `when` also keeps sequence() off the
      // negative-bound path for short docs
      .select(col("id"), explode(when(size(col("t")) >= n,
        transform(sequence(lit(0), size(col("t")) - n),
        // unit-separator join: ("ab","c") and ("a","bc") fingerprint apart
        i => struct(i.as("pos"),
          xxhash64(array_join(slice(col("t"), i + 1, lit(n)), "")).as("g"))))
        .otherwise(array()))
        .as("pg"))
      .select(col("id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
      .repartition(col("g")) // ONE exchange: serves the windows below
    // ndocs per gram = count of DISTINCT docs, computed as a windowed sum
    // over a per-(g, id) first-occurrence marker — no aggregate+join
    // round trip, everything rides the single fingerprint exchange
    val wg = Window.partitionBy(col("g"))
    val wgi = Window.partitionBy(col("g"), col("id"))
    grams
      .withColumn("__first", when(row_number().over(
        wgi.orderBy(col("pos"))) === 1, 1L).otherwise(0L))
      .withColumn("ndocs", sum(col("__first")).over(wg))
      .withColumn("owner", min(col("id")).over(wg))
      .drop("__first")
  }

  /** Cross-document span REMOVAL — the apply half of
    * [[crossDocSpanStats]] (Lee et al. 2022 exact-substring dedup):
    * every token window shared with another document is deleted from
    * every NON-OWNER document (the min-id owner keeps its text intact),
    * so each shared passage survives exactly once in the corpus.
    *
    * Pure dataflow, linear at every step: non-owned duplicated windows
    * explode to their covered token positions (a constant factor n per
    * window — no quadratic term, no per-doc interval fold), distinct
    * them, anti-join against the posexploded tokens, and reassemble in
    * order with the [[firstOccurrenceDedup]] sort-collect idiom. The
    * doc-id repartition lands BEFORE the token posexplode so that
    * exchange carries each document once, and the final right join picks
    * up short/fully-covered documents.
    *
    * Output: idCol (as `id`), `text_dedup` (sep-rejoined survivors; the
    * empty string when every token was covered), `n_tokens`,
    * `n_removed`. Documents shorter than n tokens pass through unchanged
    * (no window, hence nothing shared). Like the stats form, counts are
    * exact — no sampling, no DF cap — and aggregation state per group is
    * bounded by document length.
    */
  def crossDocSpanDedup(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 8, sep: String = " "): DataFrame = {
    val covered = markedGrams(df, textCol, idCol, n, sep)
      .filter(col("ndocs") > 1 && col("owner") =!= col("id"))
      .select(col("id"), explode(sequence(col("pos"),
        col("pos") + lit(n - 1))).as("tpos"))
      .distinct()
    val toks = df
      .select(col(idCol).cast("long").as("id"), col(textCol))
      .repartition(col("id")) // before the explode: docs move, not tokens
      .select(col("id"), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .withColumnRenamed("pos", "tpos").withColumnRenamed("col", "tok")
    toks
      .join(covered, Seq("id", "tpos"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok")),
          sep).as("text_dedup"),
        count(lit(1)).as("n_kept"))
      .join(toks.groupBy(col("id")).agg(count(lit(1)).as("n_tokens")),
        Seq("id"), "right")
      .select(col("id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Per-document mean bigram log-probability under the corpus's own
    * add-α-smoothed bigram LM — one order up from [[unigramLogProb]]:
    * p(w₂|w₁) = (c(w₁w₂)+α) / (c(w₁·)+α·V), where c(w₁·) counts w₁ as
    * a bigram CONTEXT and V is the corpus vocabulary. Word-salad and
    * shuffled-boilerplate text that unigram frequency scores well falls
    * down here: its transitions are unseen.
    *
    * Scale shape, one n-gram up from [[unigramLogProb]] but skew-proofed
    * (natural text is Zipf on BOTH join keys — "of the" on the bigram,
    * "the" on the context):
    *   - bigrams come from the native one-pass
    *     [[graft.functions.WordNgrams]] expression (strict mode: a
    *     sub-2-token doc yields an empty array, so the explode drops it
    *     with no separate length filter). The builtin-composed form
    *     needed careful array binding to dodge an O(tokens²) re-split
    *     trap — see WordNgrams' scaladoc.
    *   - ONE corpus-sized explode builds the per-doc (doc, bigram)
    *     count table `tc`; it is localCheckpoint'd because the hot/cold
    *     split legs and the model fold all consume it (ReuseExchange
    *     does not dedupe across the broadcast/probe boundaries here —
    *     measured, not assumed).
    *   - the corpus bigram table `cb` folds out of `tc` (Σ tc — a
    *     distinct-bigram-sized aggregate, NOT a second corpus pass) and
    *     the context table `cu` folds out of `cb` (vocabulary-sized).
    *     Both are vocabulary²-bounded — far past broadcast at 100 TB,
    *     so the model joins shuffle.
    *   - V needs no second corpus explode: every token is either the
    *     w1 of some bigram (any non-final position) or a document's
    *     LAST token — so V = |distinct(cu.w1 ∪ per-doc last token)|,
    *     one vocab-sized plus one row-per-doc input.
    *   - both model joins route through
    *     [[graft.operators.SkewJoin.saltedInnerHotDf]]: keys whose
    *     corpus count exceeds `hotThreshold` take a salted leg (probe
    *     salted by the doc id, build replicated `salts`× for hot keys
    *     only), so a Zipf-hot gram spreads over `salts` reducers
    *     instead of landing one giant partition. The hot lists are the
    *     model tables' own count columns — no extra detection pass.
    *   - V is a 1-row broadcast; one final re-group on the doc id.
    * Documents with < 2 tokens have no transition and are absent
    * (undefined, not 0). Output: idCol, `n_bigrams`, `mean_logp`.
    */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
                    alpha: Double = 0.5, hotThreshold: Long = 1000L,
                    salts: Int = 8): DataFrame = {
    require(alpha > 0.0, s"add-alpha smoothing needs alpha > 0, got $alpha")
    require(hotThreshold > 0, s"hotThreshold must be positive, got $hotThreshold")
    val t = split(col(textCol), " ")
    val bi = df.select(col(idCol),
      explode(graft.functions.WordNgrams.wordNgramsStrict(col(textCol), 2))
        .as("bg"))
    val tc = bi.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("tc"))
      .localCheckpoint()
    val cb = tc.groupBy(col("bg")).agg(sum(col("tc")).as("cb"))
      .localCheckpoint() // feeds cu, the hot list, and both join legs
    val cu = cb.select(split(col("bg"), " ").getItem(0).as("w1"), col("cb"))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
      .localCheckpoint() // feeds the hot list and both join legs
    // no null filter: countDistinct skips NULL already, and an explicit
    // `token.isNotNull` would be predicate-pushed below the Project,
    // re-evaluating try_element_at(split(..)) once more per doc
    val v = cu.select(col("w1").as("token"))
      .unionAll(df.select(try_element_at(t, lit(-1)).as("token")))
      .agg(countDistinct(col("token")).as("__v"))
    val withCb = graft.operators.SkewJoin.saltedInnerHotDf(
      tc, cb, "bg",
      cb.filter(col("cb") >= hotThreshold).select(col("bg")),
      col(idCol), salts)
    val withCu = graft.operators.SkewJoin.saltedInnerHotDf(
      withCb.withColumn("w1", split(col("bg"), " ").getItem(0)), cu, "w1",
      cu.filter(col("cu") >= hotThreshold).select(col("w1")),
      col(idCol), salts)
    withCu
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(sum(col("tc")).as("n_bigrams"),
        round(sum(col("tc") * log((col("cb").cast("double") + lit(alpha))
          / (col("cu").cast("double") + lit(alpha) * col("__v"))))
          / sum(col("tc")), 6).as("mean_logp"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET distribution than under the RAW distribution —
    * log w(x) = Σ_tok [ln p̂_tgt(h(tok)) − ln p̂_raw(h(tok))], with
    * tokens hashed into `buckets` cells ([[graft.functions.PolyHash]],
    * dialect-portable for the oracle) and add-one smoothing on both
    * histograms. High log_w ≈ "looks like the target corpus";
    * resampling by these weights is the selection step.
    *
    * Scale shape: both histograms are ≤ `buckets` rows regardless of
    * corpus size — they and their totals join back by BROADCAST, so the
    * only corpus-sized movement is ONE exchange on the doc id, placed
    * BEFORE the token explode (docs move once, not their tokens) and
    * reused by both the (doc, bucket) count and the final per-doc sum
    * (hash clustering on an id prefix satisfies both groupings). The
    * fixed dimensionality is the point of hashed n-grams: model size is
    * a constant, never vocabulary-sized.
    *
    * Output: idCol, `n_tokens`, `log_w` (rounded), `mean_logr`
    * (per-token mean log ratio — length-invariant variant to threshold
    * on). Token granularity is unigram; callers wanting hashed bigrams
    * can pre-join adjacent tokens upstream.
    */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, textCol: String,
                     idCol: String, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = lit(buckets.toLong)
    def toBuckets(df: DataFrame, cols: Seq[String]): DataFrame =
      df.select((col(textCol) +: cols.map(col)): _*)
        .select(cols.map(col) :+ explode(split(col(textCol), " ")).as("token"): _*)
        .select(cols.map(col) :+
          (graft.functions.PolyHash.polyHash(col("token")) % b).as("bucket"): _*)
    val rawToks = toBuckets(raw.repartition(col(idCol)), Seq(idCol))
    val rawHist = rawToks.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tgtHist = toBuckets(target, Seq.empty)
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val totals = rawHist.agg(sum(col("cr")).as("__nr"))
      .crossJoin(tgtHist.agg(sum(col("ct")).as("__nt")))
    val perBucket = rawToks.groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tc"))
      .join(broadcast(rawHist), "bucket")
      .join(broadcast(tgtHist), Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      // smoothed log ratio; textual association mirrors the oracle SQL
      .withColumn("lr",
        log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")
            / (col("__nt") + b).cast("double"))
          - log((col("cr") + lit(1L)).cast("double")
            / (col("__nr") + b).cast("double")))
    perBucket.groupBy(col(idCol))
      .agg(sum(col("tc")).as("n_tokens"),
        round(sum(col("tc") * col("lr")), 6).as("log_w"),
        round(sum(col("tc") * col("lr")) / sum(col("tc")), 6).as("mean_logr"))
  }
}
