package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the BM25 ranking function
  * (Robertson & Zaragoza 2009), the standard first-stage retriever a
  * training-data pipeline uses for decontamination lookups, targeted
  * corpus search, and hard-negative mining.
  *
  * Scale shape: the query-term set is tiny and is compiled into the
  * plan as an `IN` filter, so everything downstream of the explode is
  * proportional to MATCHING tokens only, not the corpus — the token
  * stream is filtered in the scan stage before the one (doc, term)
  * exchange. Document frequencies derive from the already-tiny
  * per-(doc, term) table (≤ |terms| rows after the re-group) and join
  * back by broadcast; corpus length stats are a 1-row broadcast. The
  * final top-k is `orderBy(...).limit(k)` — Spark plans it as
  * TakeOrderedAndProject (per-partition heap + driver merge of k·p
  * rows), never a global sort.
  */
object Retrieval {

  /** Score every document containing ≥ 1 query term with BM25 and keep
    * the global top-k (ties broken by id for engine-portable
    * determinism). Output: idCol, `dl` (doc token length), `n_terms`
    * (distinct query terms matched), `score` (rounded, ranked on).
    *
    * idf uses the "plus one" form ln(1 + (N - df + ½)/(df + ½)) —
    * always positive, the Lucene variant.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.map(_.toLowerCase) // tokens are matched lowered
    require(k1 > 0.0 && b >= 0.0 && b <= 1.0, s"bad BM25 params k1=$k1 b=$b")
    val docs = df.select(col(idCol), lower(col(textCol)).as("__t"))
      .withColumn("dl", size(split(col("__t"), " ")).cast("long"))
    // corpus scalars: one tiny aggregate, broadcast by the cross join
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val toks = docs
      .select(col(idCol), col("dl"), explode(split(col("__t"), " ")).as("token"))
      .filter(col("token").isin(terms: _*)) // scan-stage: non-query tokens never shuffle
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    // df per term from the per-(doc, term) table: one row per containing doc
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val tfd = col("tf").cast("double")
    val scored = tf.join(broadcast(dfreq), "token").crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5))
          / (col("df").cast("double") + lit(0.5))))
      // textual order mirrors the oracle SQL exactly: double addition and
      // multiplication association must match for 6-digit round parity
      .withColumn("c",
        col("idf") * (tfd * lit(k1 + 1.0))
          / (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
    scored.groupBy(col(idCol))
      .agg(min(col("dl")).as("dl"),
        count(lit(1)).as("n_terms"),
        round(sum(col("c")), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }

  /** Offline retrieval-quality evaluation — the metrics loop that keeps
    * a BM25 → ANN → RRF → MMR stack honest: reciprocal rank, NDCG@k
    * (graded, gain 2^rel − 1, the standard burges form), and recall@k,
    * one row per query.
    *
    * Inputs: `runs` (qid, id, rank — a system's ranked results) and
    * `qrels` (qid, id, rel — graded relevance judgments, rel ≥ 1 means
    * relevant; pairs absent from qrels are irrelevant). Output per qid:
    * `rr` (1/rank of the first relevant result, 0 if none), `ndcg`
    * (null when the query has no relevant documents), `recall`
    * (relevant retrieved in the top k / all relevant, null when no
    * relevant), `n_rel`, `n_ret`.
    *
    * Scale shape: one left join runs→qrels on (qid, id) — both sides
    * shard on the same key, per-query lists are k-bounded; the ideal
    * DCG ranks each query's judgments with a per-qid window
    * (parallelism = queries, frames are judgment-list-sized). Nothing
    * is collected; queries-many output rows. DCG terms are spelled
    * gain/log2(rank+1) identically on both engine and oracle sides so
    * 6-decimal rounding agrees bit-for-bit.
    */
  def evalRanking(runs: DataFrame, qrels: DataFrame, qidCol: String,
                  idCol: String, rankCol: String, relCol: String,
                  k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val r = runs.select(col(qidCol).as("qid"), col(idCol).as("id"),
      col(rankCol).cast("long").as("__rank"))
    val j = qrels.select(col(qidCol).as("qid"), col(idCol).as("id"),
      col(relCol).cast("long").as("__rel"))
    val joined = r.join(j, Seq("qid", "id"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    val gain = (pow(lit(2.0), col("__rel").cast("double")) - 1.0)
    val perQ = joined.groupBy(col("qid")).agg(
      count(lit(1)).as("n_ret"),
      coalesce(max(when(col("__rel") >= 1, lit(1.0) / col("__rank").cast("double"))),
        lit(0.0)).as("__rr"),
      sum(when(col("__rank") <= k,
        gain / log2(col("__rank").cast("double") + 1.0)).otherwise(lit(0.0))).as("__dcg"),
      sum(when(col("__rank") <= k && col("__rel") >= 1, lit(1L))
        .otherwise(lit(0L))).as("__hits"))
    // ideal DCG + relevant count from the judgments alone
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__rel").desc, col("id"))
    val ideal = j.filter(col("__rel") >= 1)
      .withColumn("__irank", row_number().over(wIdeal))
      .groupBy(col("qid")).agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__irank") <= k,
          gain / log2(col("__irank").cast("double") + 1.0))
          .otherwise(lit(0.0))).as("__idcg"))
    perQ.join(ideal, Seq("qid"), "left")
      .select(col("qid"),
        round(col("__rr") + lit(1e-12), 6).as("rr"),
        when(col("__idcg").isNotNull,
          round(col("__dcg") / col("__idcg") + lit(1e-12), 6)).as("ndcg"),
        when(col("n_rel").isNotNull,
          round(col("__hits").cast("double") / col("n_rel").cast("double")
            + lit(1e-12), 6)).as("recall"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("n_ret"))
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009): fuse
    * any number of rankings by rrf(d) = Σ_lists 1/(k + rank_d) — the
    * standard hybrid-retrieval combiner (lexical BM25 + dense ANN)
    * precisely because it needs NO score calibration between lists,
    * only ranks. k=60 is the paper's constant; larger k flattens the
    * head.
    *
    * Union-based, never an N-way join: each list contributes
    * (id, rank) rows, one groupBy sums the reciprocal ranks (map-side
    * combined), and the head is TakeOrderedAndProject. Documents
    * missing from a list contribute nothing for it — the RRF-over-union
    * convention. Output: id, `rrf_score`, `n_lists` (how many lists
    * ranked it), top `topK` by (score desc, id).
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              rankCol: String, kk: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "fusing fewer than 2 rankings is a rename")
    require(kk >= 1, s"k must be >= 1, got $kk")
    val unioned = rankings.map { case (_, r) =>
      r.select(col(idCol).cast("long").as("id"),
        col(rankCol).cast("long").as("rank"))
    }.reduce(_ unionAll _)
    unioned.groupBy(col("id"))
      .agg(round(sum(lit(1.0) / (lit(kk) + col("rank"))) + lit(1e-12), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
  }
}
