package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators._

/** Degenerate inputs through the composed operators: empty sides, single
  * rows, k larger than the group — the shapes that show up at 3 a.m. on
  * partition boundaries of a real lake.
  */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val noEvents = Seq.empty[(Long, Long, Long)].toDF("user_id", "ts", "event_id")

  test("AsOfJoin: empty right side -> every left row, null payloads") {
    val left = Seq((1L, 10L, 100L), (2L, 20L, 101L)).toDF("user_id", "ts", "event_id")
    val right = Seq.empty[(Long, Long, Long, String)].toDF("user_id", "ts", "event_id", "payload")
    val out = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "event_id", Seq("payload"))
      .select(col("event_id"), col("asof_payload")).collect()
    assert(out.length == 2 && out.forall(_.isNullAt(1)))
  }

  test("AsOfJoin: empty left side -> empty output with the full schema") {
    val right = Seq((1L, 5L, 900L, "r")).toDF("user_id", "ts", "event_id", "payload")
    val out = AsOfJoin.leftAsOf(noEvents, right, Seq("user_id"), "ts", "event_id", Seq("payload"))
    assert(out.columns.contains("asof_payload") && out.count() == 0)
  }

  test("Sessionize: empty input and single-event input") {
    assert(Sessionize.byGap(noEvents, "user_id", "ts", "event_id", 100L).count() == 0)
    val one = Seq((1L, 10L, 100L)).toDF("user_id", "ts", "event_id")
    val s = Sessionize.byGap(one, "user_id", "ts", "event_id", 100L).collect()
    assert(s.length == 1 && s.head.getAs[Long]("session_idx") == 1L)
  }

  test("ngramJaccardPairs: empty corpus and single doc emit no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text").withColumn("bk", lit("b"))
    assert(Dedup.ngramJaccardPairs(empty, "text", "doc_id", Seq("bk"), 3, 0.1).count() == 0)
    val one = Seq((1L, "just one document here")).toDF("doc_id", "text").withColumn("bk", lit("b"))
    assert(Dedup.ngramJaccardPairs(one, "text", "doc_id", Seq("bk"), 3, 0.1).count() == 0)
  }

  test("clusters: no edges -> every node its own cluster; empty ids -> empty") {
    val ids = (1L to 5L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.clusters(ids, noPairs, "doc_id", "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
    val none = Dedup.clusters(ids.filter(col("doc_id") > 99), noPairs, "doc_id", "id_a", "id_b")
    assert(none.count() == 0)
  }

  test("TopKPerGroup: k larger than any group returns whole groups, ranked") {
    GraftExtensions.register(spark)
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0)).toDF("g", "id", "v")
    // LocalRelation would be collapsed before our strategy sees sane stats;
    // route through a parquet round-trip like production data
    val dir = java.nio.file.Files.createTempDirectory("graft-topk").toString + "/t"
    df.write.parquet(dir)
    val got = graft.plans.TopKPerGroup.perGroup(
        spark.read.parquet(dir), Seq("g"), "v", "id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set((1L, 11L, 1L), (1L, 10L, 2L), (2L, 20L, 1L)))
  }

  test("GapFill: single observation per key -> one spine row, no nulls") {
    val obs = Seq((1L, "2024-03-01", 4L, "A")).toDF("k", "d", "n", "st")
      .withColumn("d", to_date(col("d")))
    val out = GapFill.fillForward(obs, "k", "d", expr("interval 1 month"),
      fillCols = Seq("st"), zeroCols = Seq("n")).collect()
    assert(out.length == 1 && out.head.getAs[String]("st") == "A")
  }

  test("Scd.collapseRuns on empty input keeps the schema, zero rows") {
    val empty = Seq.empty[(Long, String, Long, String)].toDF("k", "d", "tie", "attr")
    val out = Scd.collapseRuns(empty, "k", "d", "tie", "attr")
    assert(out.columns.toSet ==
      Set("k", "run_id", "attr", "valid_from", "valid_to", "n_rows"))
    assert(out.count() == 0)
  }

  test("heavyKeys on uniform data finds nothing; saltedAgg on empty input is empty") {
    val uniform = (1L to 100L).toDF("k")
    assert(SkewJoin.heavyKeys(uniform, "k", threshold = 2L).isEmpty)
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    val out = SkewJoin.saltedAgg(empty, "k", saltSource = col("v"), salts = 4,
      partialAggs = Seq(count(lit(1)).as("__n")),
      finalAggs = Seq(sum(col("__n")).as("n")))
    assert(out.count() == 0)
  }

  test("pageRank: empty edge set -> every node settles at (1-d)/N") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val r = graft.graph.PageRank.pageRank(edges, "src", "dst", nodes, "id")
      .collect().map(row => row.getDouble(1))
    assert(r.length == 4 && r.forall(_ == 0.0375)) // 0.15 / 4
  }

  test("crossSetNearDups: empty bench -> empty report; single-token and empty docs dedup cleanly") {
    val emptyBench = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(graft.similarity.Similarity
      .crossSetNearDups(corpus, emptyBench, "embedding", "vec_id", 0.5).count() == 0)
    val docs = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val out = graft.text.Curation.firstOccurrenceDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "" && out(2L) == "x") // empty text -> one empty span, round-trips
  }

  test("globalShuffleOrder and temperatureWeights on empty/singleton inputs") {
    val empty = Seq.empty[Long].toDF("key")
    assert(graft.operators.Sampling.globalShuffleOrder(empty, "key").count() == 0)
    val one = Seq(7L).toDF("key")
    val pos = graft.operators.Sampling.globalShuffleOrder(one, "key")
      .select(col("global_pos")).head().getLong(0)
    assert(pos == 0L)
    val oneSrc = Seq((1L, "only")).toDF("doc_id", "source")
    val w = graft.text.Curation.temperatureWeights(oneSrc, "source", alpha = 0.5).head()
    assert(w.getDouble(3) == 1.0 && w.getDouble(4) == 1.0) // sole source: full weight, keep all
  }

  test("ewma/skyline on empty and singleton inputs") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("k", "t", "x")
    assert(TimeSeries.ewma(empty, Seq("k"), Seq("t"), "x", 0.5).count() == 0)
    val one = Seq((1L, 1L, 3.5)).toDF("k", "t", "x")
    assert(TimeSeries.ewma(one, Seq("k"), Seq("t"), "x", 0.5)
      .select(col("ewma")).head().getDouble(0) == 3.5)
    val emptyPts = Seq.empty[(Long, Long, Double)].toDF("id", "x", "y")
    assert(Skyline.skyline2D(emptyPts, "x", "y", "id").count() == 0)
    val onePt = Seq((1L, 10L, 1.0)).toDF("id", "x", "y")
    assert(Skyline.skyline2D(onePt, "x", "y", "id").count() == 1)
  }

  test("kCore/dbscan/leakageSafeSplit with no edges: nothing survives, all noise, pure hash fold") {
    val ids = (1L to 5L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.graph.KCore.kCore(noPairs, "a", "b", k = 1).count() == 0)
    val d = graft.similarity.Dbscan.dbscan(ids, "id", noPairs, "a", "b", minPts = 1)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(d.length == 5 && d.forall(_ == ("noise", -1L)))
    // no pairs -> every doc is its own cluster; split is the plain hash fold
    val s = Sampling.leakageSafeSplit(ids, "id", noPairs, "a", "b")
    assert(s.count() == 5 && s.filter(col("id") =!= col("cluster")).count() == 0)
  }
}
