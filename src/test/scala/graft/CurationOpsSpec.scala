package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile
import graft.text.{Chunker, Curation, Vocab}

/** Chunker / Profile / Vocab — the round-3 curation utilities. */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // -- Chunker ----------------------------------------------------------

  test("chunks: starts advance by stride, consecutive chunks overlap by window-stride") {
    val doc = (1 to 50).map(i => s"t$i").mkString(" ")
    val out = Chunker.chunks(Seq((1L, doc)).toDF("doc_id", "text"),
        "text", "doc_id", window = 16, stride = 12)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 12L, 24L, 36L, 48L))
    // a chunk carries min(window, n - start) tokens
    assert(out.map(_.getLong(3)).toSeq == Seq(16L, 16L, 16L, 14L, 2L))
    val c0 = out(0).getString(4).split(" ")
    val c1 = out(1).getString(4).split(" ")
    assert(c0.takeRight(4).toSeq == c1.take(4).toSeq) // 16-12 overlap
  }

  test("chunks: stride tiling covers every token exactly once when stride == window") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val out = Chunker.chunks(Seq((7L, doc)).toDF("doc_id", "text"),
        "text", "doc_id", window = 16, stride = 16)
      .orderBy("chunk_id").collect()
    val rebuilt = out.map(_.getString(4)).mkString(" ")
    assert(rebuilt == doc) // lossless re-concatenation
  }

  test("chunks: short doc yields one chunk; never drops a document") {
    val out = Chunker.chunks(
      Seq((1L, "only three tokens"), (2L, "x")).toDF("doc_id", "text"),
      "text", "doc_id", window = 32, stride = 24)
    assert(out.count() == 2)
    assert(out.filter($"doc_id" === 1L).head().getLong(3) == 3L)
  }

  test("ChunkGenerator (native Generator) is row-identical to the composed Chunker") {
    import graft.functions.ChunkGenerator
    // real corpus + adversarial shapes: empty string, multi-space (empty
    // tokens), trailing/leading separators, single token, doc shorter
    // than a window
    val weird = Seq((9001L, ""), (9002L, "a  b   c "), (9003L, " x"),
      (9004L, "solo"), (9005L, "a b")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").unionByName(weird)
    for ((w, s) <- Seq((32, 24), (16, 16), (5, 2))) {
      val composed = graft.text.Chunker.chunks(docs, "text", "doc_id", w, s)
      val native = ChunkGenerator.chunks(docs, "text", "doc_id", w, s)
      assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
        s"window=$w stride=$s diverged")
    }
  }

  test("ChunkGenerator streams chunks lazily (iterator, not a materialized array)") {
    import graft.functions.ChunkGenerator
    // a 200k-token doc yields 100k chunks of ~window tokens; generating
    // them through the iterator must not blow a small driver take()
    val big = Seq((1L, (1 to 200000).map(i => "t" + (i % 89)).mkString(" ")))
      .toDF("doc_id", "text")
    val firstRows = ChunkGenerator.chunks(big, "text", "doc_id", 64, 2).take(3)
    assert(firstRows.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(firstRows.forall(_.getLong(3) == 64L))
  }

  // -- Profile ----------------------------------------------------------

  test("profile counts nulls/distincts per column from one pass") {
    val df = Seq((Some(1), Some("a")), (None, Some("a")), (Some(3), None))
      .toDF("num", "str")
    val rows = Profile.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("num").getLong(1) == 3L)    // n_rows
    assert(rows("num").getLong(2) == 1L)    // n_null
    assert(rows("num").getLong(3) == 2L)    // n_distinct (nulls excluded)
    assert(rows("num").getString(4) == "1" && rows("num").getString(5) == "3")
    assert(rows("str").getLong(2) == 1L && rows("str").getLong(3) == 1L)
  }

  test("profile branches are column-pruned scans feeding HashAggregates (no row expansion)") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
    val plan = Profile.profile(df, Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    // one scan per column, each reading ONLY its column (union of pruned
    // scans = each byte read once in total)
    assert("Scan parquet".r.findAllIn(plan).length == 3)
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"))
    assert(plan.contains("ReadSchema: struct<o_orderstatus:string>"))
    // the distinct-value level stays HashAggregate; no Expand, and no
    // SortAggregate over the full row stream (string min/max only ever
    // sorts the distinct-value rollup)
    assert(!plan.contains("Expand"))
    assert(plan.contains("HashAggregate"))
  }

  // -- Vocab ------------------------------------------------------------

  test("topK is deterministic under ties (count desc, then token asc)") {
    val docs = Seq("b b a a c").toDF("text")
    val v = Vocab.topK(docs, "text", 2).collect()
    assert(v.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("a", 2L, 1L), ("b", 2L, 2L))) // a before b on the tie
  }

  test("oovRate: zero for fully-covered docs, exact fraction otherwise") {
    val docs = Seq((1L, "a b a b"), (2L, "a b zzz qqq")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val out = Vocab.oovRate(docs, "text", "doc_id", vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L) == ((2L, 0.5)))
  }

  test("oovRate broadcasts the vocabulary (no shuffle of the corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Vocab.oovRate(docs, "text", "doc_id",
        Vocab.topK(docs, "text", 50))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // -- Curation ---------------------------------------------------------

  test("firstOccurrenceDedup: keeps first occurrence, preserves order, counts spans") {
    val docs = Seq((1L, "b a b c a"), (2L, "x x x"), (3L, "solo")).toDF("doc_id", "text")
    val out = Curation.firstOccurrenceDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("b a c", 5L, 3L)))
    assert(out(2L) == (("x", 3L, 1L)))
    assert(out(3L) == (("solo", 1L, 1L)))
  }

  test("firstOccurrenceDedup: sep=\"\\n\" is exact duplicate-line removal") {
    val docs = Seq((1L, "keep me\ndrop dup\ndrop dup\nlast line")).toDF("doc_id", "text")
    val out = Curation.firstOccurrenceDedup(docs, "text", "doc_id", sep = "\n").head()
    assert(out.getString(1) == "keep me\ndrop dup\nlast line")
    assert((out.getLong(2), out.getLong(3)) == ((4L, 3L)))
  }

  test("firstOccurrenceDedup: one exchange, carrying docs not spans (explode above it)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val df = Curation.firstOccurrenceDedup(docs, "text", "doc_id")
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    // the Generate (posexplode) must sit ABOVE the exchange: the shuffle
    // moves one row per document, span rows never cross the wire
    val exIdx = plan.indexOf("Exchange")
    val genIdx = plan.indexOf("Generate")
    assert(genIdx >= 0 && genIdx < exIdx, plan)
  }

  test("scoreLinear: sigmoid of the declared linear form, zero-weight model gives sigmoid(bias)") {
    val docs = Seq((1L, "the a xx")).toDF("doc_id", "text")
    val flat = Curation.scoreLinear(docs, "text", "doc_id",
      weights = Map.empty, bias = 0.0, stopwords = Seq("the")).head().getDouble(1)
    assert(flat == 0.5)
    // n_tokens=3, avg_token_len=(8-2)/3=2, distinct_ratio=1, stopword_ratio=2/3
    val z = 1.0 * 3 + 0.5 * 2 // weights below: n_tokens=1, avg_token_len=0.5
    val s = Curation.scoreLinear(docs, "text", "doc_id",
      weights = Map("n_tokens" -> 1.0, "avg_token_len" -> 0.5),
      bias = 0.0, stopwords = Seq("the", "a")).head().getDouble(1)
    assert(math.abs(s - 1.0 / (1.0 + math.exp(-z))) < 1e-6)
    intercept[IllegalArgumentException] {
      Curation.scoreLinear(docs, "text", "doc_id",
        Map("nope" -> 1.0), 0.0, Seq("the"))
    }
  }

  test("scoreLinear is scan-stage only: no Exchange in the plan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Curation.scoreLinear(docs, "text", "doc_id",
        weights = Map("n_tokens" -> 0.02, "stopword_ratio" -> -3.0),
        bias = -1.5, stopwords = Seq("the", "a"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("temperatureWeights: alpha=1 reproduces the natural distribution, rates capped at 1") {
    val docs = (1 to 30).map(i => (i.toLong, if (i <= 20) "big" else "small"))
      .toDF("doc_id", "source")
    val w1 = Curation.temperatureWeights(docs, "source", alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(w1("big") == ((0.666667, 0.666667, 1.0)))
    assert(w1("small") == ((0.333333, 0.333333, 1.0)))
    // alpha<1 flattens: the small source's mix share rises above natural,
    // the big source gets down-sampled relative to the small one
    val wh = Curation.temperatureWeights(docs, "source", alpha = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(wh("small")._1 > 0.333333 && wh("big")._1 < 0.666667)
    assert(wh("small")._2 == 1.0 && wh("big")._2 < 1.0)
  }

  test("crossDocSpanStats: shared windows, ownership, multiplicity, short docs, 2 exchanges") {
    val docs = Seq(
      (1L, "p q r s t"),          // owns the shared "p q r"
      (2L, "x y p q r"),          // shares it, doesn't own it
      (3L, "m n o a b"),          // nothing shared
      (4L, "u v w u v w u v"),    // repeats "u v w" twice, shared with doc 5
      (5L, "u v w z z"),
      (6L, "a b")                 // shorter than n: no window, absent
    ).toDF("doc_id", "text")
    val df = Curation.crossDocSpanStats(docs, "text", "doc_id", n = 3)
    val out = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(!out.contains(6L))
    assert(out(1L) == ((3L, 1L, 1L, 0.333333)))
    assert(out(2L) == ((3L, 1L, 0L, 0.333333)))
    assert(out(3L) == ((3L, 0L, 0L, 0.0)))
    // both of doc 4's "u v w" windows count; its intra-doc-only repeats
    // ("v w u", "w u v") do not — cross-doc means >= 2 distinct docs
    assert(out(4L) == ((6L, 2L, 2L, 0.333333)))
    assert(out(5L) == ((3L, 1L, 0L, 0.333333)))
    // one exchange serves the gram aggregate + window; one re-groups by doc
    // (count the AQE final-plan section only — the string repeats the
    // initial plan below it)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("crossDocSpanDedup removes non-owned shared windows; owner and short docs intact") {
    val docs = Seq(
      (1L, "p q r s t"),          // owner of the shared "p q r"
      (2L, "x y p q r"),          // loses its copy
      (3L, "m n o a b"),          // untouched
      (4L, "u v w u v w u v"),    // owner; intra-doc repeats untouched
      (5L, "u v w z z"),          // loses "u v w"
      (6L, "a b"),                // shorter than n: passes through
      (7L, "p q r"),              // fully covered -> empty string, not absent
      (8L, "a1 a2 a3 a4 a5 a6"),  // owner of three overlapping windows
      (9L, "z a1 a2 a3 a4 a5")    // overlapping covered spans union to 1..5
    ).toDF("doc_id", "text")
    val out = Curation.crossDocSpanDedup(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("p q r s t", 5L, 0L)))
    assert(out(2L) == (("x y", 5L, 3L)))
    assert(out(3L) == (("m n o a b", 5L, 0L)))
    assert(out(4L) == (("u v w u v w u v", 8L, 0L)))
    assert(out(5L) == (("z z", 5L, 3L)))
    assert(out(6L) == (("a b", 2L, 0L)))
    assert(out(7L) == (("", 3L, 3L)))
    assert(out(8L) == (("a1 a2 a3 a4 a5 a6", 6L, 0L)))
    assert(out(9L) == (("z", 6L, 5L)))
    assert(out.size == 9)
    // corpus-level guarantee: every shared window survives exactly once —
    // re-running stats on the deduped corpus finds nothing cross-doc
    val redo = Curation.crossDocSpanStats(
      Curation.crossDocSpanDedup(docs, "text", "doc_id", n = 3)
        .select(col("id").as("doc_id"), col("text_dedup").as("text")),
      "text", "doc_id", n = 3)
    assert(redo.filter(col("n_dup_grams") > 0).count() == 0)
  }

  test("Gopher flags: each rule fails on its crafted violator, passes the healthy doc") {
    val healthy = (("the quick brown fox jumps right over that lazy sleeping dog " +
      "and every person living near with them watched quietly from their porch ") * 5).trim
    val docs = Seq(
      (1L, healthy),                                     // all rules pass
      (2L, "way too short to keep"),                     // n_words < 50
      (3L, ("spam ham " * 40).trim),                     // top-bigram mass ~0.89
      (4L, (("## see more... " + healthy.split(" ").take(6).mkString(" ") + " ") * 10).trim),
      (5L, (1 to 60).map(_ => "zz91 7&7*").mkString(" ")) // no stopwords, low alpha frac
    ).toDF("doc_id", "text")
    val out = graft.text.Gopher.flags(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("gopher_pass"),
      out(1L).toString) // 110 words, stopwords the/that/and/with, clean
    assert(!out(2L).getAs[Boolean]("gopher_pass") && out(2L).getAs[Long]("n_words") == 5L)
    val d3 = out(3L)
    assert(d3.getAs[Double]("top_bigram_char_frac") > 0.85
      && !d3.getAs[Boolean]("gopher_pass"), d3.toString)
    assert(out(4L).getAs[Double]("symbol_word_ratio") > 0.1
      && !out(4L).getAs[Boolean]("gopher_pass"))
    val d5 = out(5L)
    assert(d5.getAs[Long]("stopword_hits") == 0L
      && d5.getAs[Double]("alpha_word_frac") == 0.5
      && !d5.getAs[Boolean]("gopher_pass"), d5.toString)
    // the battery is scan-stage only: no Exchange anywhere in the plan
    val plan = graft.text.Gopher.flags(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("tokenBudget: exact allocation, repetition factor, capped sample rate") {
    // source a: 1 doc x 100 tokens; source b: 1 doc x 400 tokens
    val docs = Seq(
      ("a", (1 to 100).map(_ => "t").mkString(" ")),
      ("b", (1 to 400).map(_ => "t").mkString(" "))).toDF("source", "text")
    // alpha=0.5: weights 10/30 and 20/30
    val out = Curation.tokenBudget(docs, "source", "text", alpha = 0.5,
        budgetTokens = 300L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("a") == ((100L, 0.333333, 100L, 1.0, 1.0)))
    assert(out("b") == ((400L, 0.666667, 200L, 0.5, 0.5)))
    // a budget above supply reports epochs > 1 but caps the sample rate
    val big = Curation.tokenBudget(docs, "source", "text", alpha = 0.5,
        budgetTokens = 3000L)
      .collect().map(r => r.getString(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    assert(big("a") == ((10.0, 1.0)) && big("b") == ((5.0, 1.0)), big)
  }

  test("unigramLogProb: exact on a hand-computed corpus; boilerplate outscores rare text") {
    // corpus: tokens a,a,a,b → p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = Curation.unigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - math.log(0.75)) < 1e-6)
    assert(math.abs(out(2L)._2 - math.log(0.25)) < 1e-6)
    assert(out(1L)._2 > out(2L)._2) // common text scores higher
  }
}
