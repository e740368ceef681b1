package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Curation, Retrieval}

/** BM25 retrieval and DSIR importance weighting. */
class RetrievalDsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // -- BM25 -------------------------------------------------------------

  test("bm25TopK matches the closed-form score on a hand-built corpus") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("a", "c"),
        k1 = 1.2, b = 0.75, topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // same arithmetic, plain Scala doubles
    val n = 3.0; val avgdl = (3 + 2 + 4) / 3.0
    def idf(df: Int) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def c(tf: Long, df: Int, dl: Long) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, 1L, r6(c(2, 1, 3)))))           // d1: only "a"
    assert(out(2L) == ((2L, 1L, r6(c(1, 2, 2)))))           // d2: only "c"
    assert(out(3L) == ((4L, 1L, r6(c(4, 2, 4)))))           // d3: "c" ×4
  }

  test("bm25TopK: docs with no query term are absent; topK truncates by (score, id)") {
    val docs = Seq((1L, "x y z"), (2L, "q q"), (3L, "q q"), (4L, "q q"))
      .toDF("doc_id", "text")
    val all = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("q"), topK = 10)
    assert(all.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    // 2/3/4 tie exactly (same tf, dl): the id tiebreak keeps the lowest ids
    val top2 = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("q"), topK = 2)
    assert(top2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("bm25TopK: b=0 disables length normalization; b=1 penalizes the longer doc") {
    // same tf for the term, very different lengths
    val docs = Seq((1L, "t " + ("pad " * 60).trim), (2L, "t x")).toDF("doc_id", "text")
    val b0 = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("t"), b = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(b0(1L) == b0(2L))
    val b1 = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("t"), b = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(b1(1L) < b1(2L))
  }

  test("bm25TopK on the corpus: every returned doc contains >= 1 query term") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val terms = Seq("stream", "merge")
    val out = Retrieval.bm25TopK(docs, "text", "doc_id", terms, topK = 5)
    assert(out.count() == 5)
    val joined = out.join(docs, "doc_id")
      .filter(!terms.map(t => array_contains(split(lower(col("text")), " "), t))
        .reduce(_ || _))
    assert(joined.isEmpty)
  }

  // -- PMI collocations -------------------------------------------------

  test("pmiCollocations: exact counts and PMI on a hand corpus; 1-token docs ignored") {
    import graft.text.TextFns
    val docs = Seq("x y x y", "x y z", "solo").toDF("text")
    val out = TextFns.pmiCollocations(docs, "text", minCount = 1L, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pmi(cab: Long, ca: Long, cb: Long) = // uni total 8 (incl "solo"), bigram total 5
      r6(math.log((cab / 5.0) / ((ca / 8.0) * (cb / 8.0))))
    assert(out("x y") == ((3L, 3L, 3L, pmi(3, 3, 3))))
    assert(out("y x") == ((1L, 3L, 3L, pmi(1, 3, 3))))
    assert(out("y z") == ((1L, 3L, 1L, pmi(1, 3, 1))))
    assert(out.size == 3)
  }

  test("pmiCollocations: minCount prunes the hapax tail; topK truncates by (pmi, bigram)") {
    import graft.text.TextFns
    val docs = Seq("a b a b a b", "c d", "e f").toDF("text")
    val pruned = TextFns.pmiCollocations(docs, "text", minCount = 2L, topK = 10)
      .select("bigram").as[String].collect().toSet
    assert(pruned == Set("a b", "b a")) // "c d"/"e f" are hapax
    val top = TextFns.pmiCollocations(docs, "text", minCount = 1L, topK = 2)
      .select("bigram").as[String].collect().toSet
    // "c d" and "e f" have the (equal) highest PMI; bigram tiebreak keeps "c d"
    assert(top.contains("c d") && top.contains("e f"))
  }

  // -- Zipf fit ---------------------------------------------------------

  test("zipfFit: planted power-law corpus fits slope ~ -1 with high r2") {
    import graft.text.TextFns
    // token w_r appears floor(1024/r) times, r = 1..16 — exact Zipf shape
    val text = (1 to 16).flatMap(r => Seq.fill(1024 / r)(s"w$r")).mkString(" ")
    val out = TextFns.zipfFit(Seq(text).toDF("text"), "text").head()
    assert(out.getLong(0) == 16L)
    assert(out.getLong(1) == (1 to 16).map(1024 / _).sum.toLong)
    assert(math.abs(out.getDouble(2) + 1.0) < 0.05, s"slope ${out.getDouble(2)}")
    assert(out.getDouble(4) > 0.999, s"r2 ${out.getDouble(4)}")
  }

  test("zipfFit two-level ranks equal the single-window ranks (regression identical)") {
    import graft.text.TextFns
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select($"text")
    val two = TextFns.zipfFit(docs, "text").head()
    val counts = docs.select(explode(split(lower($"text"), " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(Window.orderBy(desc("cnt"), $"token")).cast("long"))
    val one = counts.agg(
      round(regr_slope(log($"cnt".cast("double")), log($"rank".cast("double"))), 6),
      round(regr_r2(log($"cnt".cast("double")), log($"rank".cast("double"))), 6)).head()
    assert(two.getDouble(2) == one.getDouble(0) && two.getDouble(4) == one.getDouble(1))
  }

  // -- bigram LM --------------------------------------------------------

  test("bigramLogProb: exact smoothed values on a hand corpus; short docs absent") {
    import graft.text.Curation
    val docs = Seq((1L, "x y x y"), (2L, "y y"), (3L, "solo")).toDF("doc_id", "text")
    val out = Curation.bigramLogProb(docs, "text", "doc_id", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // V = 3 (x, y, solo); cb: "x y"->2 "y x"->1 "y y"->1; cu: x->2 y->2
    def lp(cb: Long, cu: Long) = math.log((cb + 0.5) / (cu + 0.5 * 3))
    assert(out(1L) == ((3L, r6((2 * lp(2, 2) + 1 * lp(1, 2)) / 3))))
    assert(out(2L) == ((1L, r6(lp(1, 2)))))
    assert(!out.contains(3L)) // no transition — absent, not zero
  }

  test("bigramLogProb: hot-key salted legs activate and are row-identical") {
    import graft.text.Curation
    // "the" is the Zipf-hot context here (2 per doc × 40 docs = 80);
    // threshold 10 puts it (and the repeated bigrams) on the salted leg
    val docs = (1L to 40L).map(i => (i, "the quick fox saw the lazy dog"))
      .toDF("doc_id", "text")
      .unionByName(Seq((99L, "rare bigram here")).toDF("doc_id", "text"))
    val hot = Curation.bigramLogProb(docs, "text", "doc_id",
      hotThreshold = 10L, salts = 4)
    // the salted join legs must survive into the physical plan
    assert(hot.queryExecution.executedPlan.toString.contains("__salt"))
    val cold = Curation.bigramLogProb(docs, "text", "doc_id",
      hotThreshold = 1000000L)
    val hs = hot.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cs = cold.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hs == cs && hs.size == 41)
  }

  test("bigramLogProb: an unseen-transition doc scores below the corpus idiom") {
    import graft.text.Curation
    val docs = (1L to 9L).map(i => (i, "the quick fox")).toDF("doc_id", "text")
      .unionByName(Seq((10L, "fox the"), (11L, "the quick")).toDF("doc_id", "text"))
    val w = Curation.bigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(11L) > w(1L))  // pure high-frequency transition beats the 3-token doc
    assert(w(1L) > w(10L))  // "fox the" transition never occurs elsewhere
  }

  // -- DSIR -------------------------------------------------------------

  test("dsirLogWeights: target == raw cancels exactly to log_w = 0") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "a a f")).toDF("doc_id", "text")
    val out = Curation.dsirLogWeights(docs, docs, "text", "doc_id")
    assert(out.count() == 3)
    assert(out.filter(col("log_w") =!= 0.0 || col("mean_logr") =!= 0.0).isEmpty)
    assert(out.filter(col("doc_id") === 3L).head().getLong(1) == 3L) // n_tokens
  }

  test("dsirLogWeights: target-like docs outscore off-target docs") {
    // target speaks {aa..ad}; off-target vocabulary is {zx..za}
    val raw = Seq((1L, "aa ab ac ad"), (2L, "zx zy zz za"), (3L, "aa ab zz za"))
      .toDF("doc_id", "text")
    val target = Seq((10L, "aa ab ac ad aa ab")).toDF("doc_id", "text")
    val w = Curation.dsirLogWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L))
    assert(w(1L) > 0.0 && w(2L) < 0.0)
  }

  test("dsirLogWeights: mean_logr is the per-token mean and histograms stay bucket-bounded") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val target = docs.filter(col("lang") === "en")
    val out = Curation.dsirLogWeights(docs, target, "text", "doc_id", buckets = 64)
    assert(out.count() == docs.count()) // every raw doc scored
    val bad = out.filter(
      abs(col("mean_logr") - round(col("log_w") / col("n_tokens"), 6)) > lit(1e-6))
    assert(bad.isEmpty)
    // the model is fixed-size by construction: distinct buckets <= 64
    val nb = docs.select(explode(split(col("text"), " ")).as("t"))
      .select((graft.functions.PolyHash.polyHash(col("t")) % 64L).as("b"))
      .distinct().count()
    assert(nb <= 64)
  }

  test("bestPassage: densest window wins, earliest on tie, no-match docs dropped") {
    import graft.text.Snippet
    val docs = Seq(
      // two hits cluster at the tail: window must anchor at position 7
      (1L, "x x x cat x x x cat dog y"),
      // tie between two 1-hit windows: earliest anchor (pos 1) wins
      (2L, "a cat b c d e f g h i j k cat z"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val out = Snippet.bestPassage(docs, "text", "doc_id",
        Seq("cat", "dog"), window = 3, topK = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((7L, 2L, "cat dog y")))
    assert(out(2L) == ((1L, 1L, "cat b c")))
    assert(!out.contains(3L)) // no query term -> dropped
    // window truncates at the document end
    val tail = Snippet.bestPassage(Seq((9L, "a b cat")).toDF("doc_id", "text"),
      "text", "doc_id", Seq("cat"), window = 5).head()
    assert(tail.getLong(1) == 2L && tail.getString(3) == "cat")
    intercept[IllegalArgumentException] {
      Snippet.bestPassage(docs, "text", "doc_id", Seq(), window = 3)
    }
  }

  test("rrfFuse: consensus beats a single #1; closed-form scores; union not join") {
    import graft.text.Retrieval
    // doc 10 is #1 lexically but absent from dense; doc 20 is #2 in both
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val dense = Seq((40L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> dense),
        "doc_id", "rank", kk = 60, topK = 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    def rr(r: Long) = 1.0 / (60 + r)
    assert(out(20L)._1 == math.rint((rr(2) + rr(2) + 1e-12) * 1e6) / 1e6)
    assert(out(20L)._2 == 2L && out(10L)._2 == 1L)
    // two #2s beat one #1: 2/62 > 1/61
    assert(out(20L)._1 > out(10L)._1 && out(30L)._1 > out(10L)._1)
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("only" -> lex), "doc_id", "rank")
    }
  }

  test("evalRanking: hand-checked MRR, NDCG@k, recall@k; null metrics without judgments") {
    import graft.text.Retrieval
    // qa: ranks 1..3 = docs 1,2,3; rel(2)=2, rel(3)=1, rel(4)=3 (unretrieved)
    // qb: ranked but zero judged-relevant docs
    val runs = Seq(("qa", 1L, 1L), ("qa", 2L, 2L), ("qa", 3L, 3L),
      ("qb", 7L, 1L)).toDF("qid", "id", "rank")
    val qrels = Seq(("qa", 2L, 2L), ("qa", 3L, 1L), ("qa", 4L, 3L))
      .toDF("qid", "id", "rel")
    val out = Retrieval.evalRanking(runs, qrels, "qid", "id", "rank", "rel", k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val qa = out("qa")
    // first relevant at rank 2 -> rr = 0.5
    assert(qa.getAs[Double]("rr") == 0.5)
    // dcg@2 = 0 + (2^2-1)/log2(3); idcg@2 = (2^3-1)/log2(2) + (2^2-1)/log2(3)
    val dcg = 3.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 7.0 + dcg
    assert(qa.getAs[Double]("ndcg") == math.rint((dcg / idcg + 1e-12) * 1e6) / 1e6)
    // top-2 retrieved contains 1 of the 3 relevant docs
    assert(qa.getAs[Double]("recall") == 0.333333)
    assert(qa.getAs[Long]("n_rel") == 3L && qa.getAs[Long]("n_ret") == 3L)
    val qb = out("qb")
    assert(qb.getAs[Double]("rr") == 0.0 && qb.isNullAt(2) && qb.isNullAt(3))
    assert(qb.getAs[Long]("n_rel") == 0L)
    intercept[IllegalArgumentException] {
      Retrieval.evalRanking(runs, qrels, "qid", "id", "rank", "rel", k = 0)
    }
  }
}
