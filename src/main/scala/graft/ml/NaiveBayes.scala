package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens — the classic
  * bag-of-words classifier (fastText-without-embeddings shape) a
  * curation pipeline trains in-engine for cheap corpus routing:
  * language ID, source attribution, quality tiers. Complements
  * [[LogReg]]: that one trains on dense embeddings by iteration, this
  * one on sparse token counts in ONE aggregation pass (counting IS
  * training).
  *
  * Engine-exact without fixed-point tricks: the model is integer
  * counts pushed through one ln() each, snapped to the 1e-6 grid
  * (the repo's round-to-grid argument); scoring sums the snapped
  * log-likelihoods as DECIMAL(18,6) — exact and order-free — so
  * argmax decisions replay bit-for-bit in SQL.
  *
  * Scale shape: training is one explode-aggregate to the
  * (class × vocabulary) count table; the dense model (vocabulary ×
  * classes, add-one smoothed) and the priors are vocabulary-sized and
  * broadcast into the scoring join; scoring work is tokens × classes
  * with map-side partial sums per (doc, class). Nothing corpus-sized
  * is ever collected.
  */
object NaiveBayes {

  /** (priors, likelihoods): priors = (cls, n_docs, logprior);
    * likelihoods = the DENSE (cls, term, cnt, ll) table with add-one
    * smoothing — unseen (term, class) pairs get cnt = 0 rather than
    * being absent, so scoring needs no fallback path. */
  def model(docs: DataFrame, textCol: String, classCol: String)
      : (DataFrame, DataFrame) = {
    // the corpus-sized token explode runs ONCE, into the checkpointed
    // (class × vocab) count table; totals, vocab size, and the dense
    // grid all derive from it (the q_dbscan multi-consumer lesson —
    // without the cut, four consumers would re-run the explode)
    val counts = docs.select(col(classCol).as("cls"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .groupBy(col("cls"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = counts.groupBy(col("cls")).agg(sum(col("cnt")).as("tot"))
    val vocabN = counts.select(col("term")).distinct()
      .agg(count(lit(1)).as("v"))
    val classes = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val nAll = classes.agg(sum(col("n_docs")).as("n_all"))
    val priors = classes.crossJoin(broadcast(nAll))
      .select(col("cls"), col("n_docs"),
        round(log(col("n_docs").cast("double") / col("n_all").cast("double"))
          + lit(1e-12), 6).as("logprior"))
    val dense = counts.select(col("term")).distinct()
      .crossJoin(classes.select(col("cls")))
      .join(counts, Seq("cls", "term"), "left")
      .select(col("cls"), col("term"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val lik = dense.join(broadcast(tot), Seq("cls"))
      .crossJoin(broadcast(vocabN))
      .select(col("cls"), col("term"), col("cnt"),
        round(log((col("cnt") + lit(1L)).cast("double")
          / (col("tot") + col("v")).cast("double")) + lit(1e-12), 6).as("ll"))
    (priors, lik)
  }

  /** Argmax class per document (ties to the lexicographically first
    * class): score = logprior + Σ ll over token OCCURRENCES, summed as
    * DECIMAL(18,6). Assumes every token appears in the model's vocab
    * (true when scoring the training corpus; route unseen tokens
    * through a retrain or drop them upstream otherwise — an inner join
    * silently drops them here, the add-one floor only covers seen-vocab
    * × unseen-class). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            priors: DataFrame, lik: DataFrame): DataFrame = {
    val tokens = docs.select(col(idCol), col(textCol))
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("term"))
    val perClass = tokens
      .join(broadcast(lik.select(col("cls"), col("term"), col("ll"))), Seq("term"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("ll").cast("decimal(18,6)")).as("ll_sum"))
      .join(broadcast(priors.select(col("cls"), col("logprior"))), Seq("cls"))
      .select(col(idCol), col("cls"),
        (col("ll_sum") + col("logprior").cast("decimal(18,6)")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("cls"))
    perClass.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cls").as("pred"),
        col("score").cast("double").as("score"))
  }
}
