package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Gopher rule-based quality battery (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", Appendix A) — the canonical pre-filter
  * set production corpora run before any model-based scoring: word-count
  * and word-length windows, alphabetic-word and symbol ratios, stopword
  * containment, duplicate-line fraction, and top-bigram character mass.
  *
  * Every metric is a per-document expression over the row's own text —
  * the whole battery is ONE codegen span over the scan, zero shuffles at
  * any corpus size (the [[Curation.scoreLinear]] shape). The only
  * non-trivial metric, top-bigram character fraction, reuses the
  * [[TextFns.repetitionStatsScanOnly]] sorted-run fold, extended to
  * carry the best gram so its character mass is known; ties keep the
  * lexicographically smallest gram (the sorted array + strictly-greater
  * replacement make that automatic), which is what the DuckDB oracle's
  * (count DESC, gram ASC) tiebreak replays.
  *
  * `gopher_pass` applies the paper's thresholds to the ROUNDED metrics
  * (both engines derive the flag from identical rounded values, so the
  * boolean can never disagree while the metrics agree).
  */
object Gopher {

  /** The 8 containment stopwords of the Gopher rules (distinct from the
    * frequency stopwords in [[TextFns.Stopwords]]).
    */
  val ContainmentWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def flags(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val text = col("__text")
    val toks = split(text, " ")
    val n = size(toks)
    val meanLen = (length(text) - (n - 1)).cast("double") / n
    val alphaFrac = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / n
    val stopHits = size(array_intersect(
      array_distinct(split(lower(text), " ")),
      array(ContainmentWords.map(lit): _*)))
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text)
      - length(regexp_replace(text, java.util.regex.Pattern.quote("..."), ""))) / lit(3)
    val symbolRatio = (hashes + ellipses).cast("double") / n
    val lines = split(text, "\n")
    val dupLineFrac = lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)
    val r6 = (c: org.apache.spark.sql.Column) => round(c + lit(1e-12), 6)

    df.select(col(idCol), col(textCol).as("__text"))
      .withColumn("__g", graft.text.TextFns.allNgrams(lower(col("__text")), 2))
      // sorted-run fold carrying the best gram: strictly-greater
      // replacement over the sorted array keeps the smallest gram on ties
      .withColumn("__top", expr("""
        aggregate(sort_array(__g),
          named_struct('prev', '', 'run', 0L, 'bestn', 0L, 'bestg', ''),
          (acc, x) -> named_struct(
            'prev', x,
            'run', IF(x = acc.prev, acc.run + 1, 1L),
            'bestn', IF(IF(x = acc.prev, acc.run + 1, 1L) > acc.bestn,
                        IF(x = acc.prev, acc.run + 1, 1L), acc.bestn),
            'bestg', IF(IF(x = acc.prev, acc.run + 1, 1L) > acc.bestn,
                        x, acc.bestg)))"""))
      .select(col(idCol),
        n.cast("long").as("n_words"),
        r6(meanLen).as("mean_word_len"),
        r6(alphaFrac).as("alpha_word_frac"),
        stopHits.cast("long").as("stopword_hits"),
        r6(symbolRatio).as("symbol_word_ratio"),
        r6(dupLineFrac).as("dup_line_frac"),
        r6(col("__top.bestn").cast("double") * length(col("__top.bestg"))
          / length(col("__text"))).as("top_bigram_char_frac"))
      .withColumn("gopher_pass",
        col("n_words").between(50, 100000)
          && col("mean_word_len").between(3.0, 10.0)
          && col("alpha_word_frac") >= 0.8
          && col("stopword_hits") >= 2
          && col("symbol_word_ratio") <= 0.1
          && col("dup_line_frac") <= 0.3
          && col("top_bigram_char_frac") <= 0.2)
  }
}
