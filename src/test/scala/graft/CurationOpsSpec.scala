package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile
import graft.text.{Chunker, Vocab}

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
}
