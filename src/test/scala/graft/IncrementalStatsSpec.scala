package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.IncrementalStats
import graft.sources.VersionedTable

class IncrementalStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-incstats-spec")
      .toString + "/index"

  private def direct(rows: Seq[(Long, String)]): Map[String, (Long, Long)] = {
    val toks = rows.flatMap { case (id, t) =>
      t.toLowerCase.split(" ").filter(_.nonEmpty).map(id -> _) }
    toks.groupBy(_._2).map { case (term, xs) =>
      term -> (xs.map(_._1).distinct.size.toLong, xs.size.toLong) }
  }

  test("merged stats at every version equal a direct recompute of that prefix") {
    val b0 = Seq((0L, "the cat sat"), (1L, "the dog sat down"))
    val b1 = Seq((2L, "the cat ran"), (3L, "a new dog"))
    val t = freshTable()
    IncrementalStats.addBatch(spark, b0.toDF("doc_id", "text"), "text", "doc_id", t, 0L)
    IncrementalStats.addBatch(spark, b1.toDF("doc_id", "text"), "text", "doc_id", t, 1L)

    def got(v: Option[Long]): Map[String, (Long, Long)] =
      IncrementalStats.termStats(spark, t, v)
        .filter(col("term").isNotNull)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(Some(0L)) == direct(b0))
    assert(got(None) == direct(b0 ++ b1))
    // corpus row carries (N docs, total tokens)
    val Array(n, tok) = IncrementalStats.termStats(spark, t, None)
      .filter(col("term").isNull)
      .select(col("df"), col("tf")).head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(n == 4 && tok == b0.++(b1).map(_._2.split(" ").length).sum)
  }

  test("compact folds partials to one row per term; stats unchanged; pinned reads keep partials") {
    val b0 = Seq((0L, "x y x"), (1L, "y z"))
    val b1 = Seq((2L, "x z z"))
    val t = freshTable()
    IncrementalStats.addBatch(spark, b0.toDF("doc_id", "text"), "text", "doc_id", t, 0L)
    IncrementalStats.addBatch(spark, b1.toDF("doc_id", "text"), "text", "doc_id", t, 1L)
    val before = IncrementalStats.termStats(spark, t)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    val rawBefore = VersionedTable.read(spark, t).count()
    IncrementalStats.compact(spark, t)
    val after = IncrementalStats.termStats(spark, t)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after == before)
    // one row per term now (3 terms + corpus row), fewer than the partials
    val rawAfter = VersionedTable.read(spark, t).count()
    assert(rawAfter == 4 && rawAfter < rawBefore)
    // time travel below the compaction still replays partials
    assert(VersionedTable.readVersion(spark, t, 1L).count() == rawBefore)
    // appends after compaction keep merging correctly
    IncrementalStats.addBatch(spark, Seq((3L, "x q")).toDF("doc_id", "text"),
      "text", "doc_id", t, 2L)
    val withNew = IncrementalStats.termStats(spark, t)
      .filter(col("term") === "x").head()
    assert(withNew.getLong(1) == 3 && withNew.getLong(2) == 4)
  }

  test("(txnApp, txn) replay appends nothing") {
    val t = freshTable()
    def run() = IncrementalStats.addBatch(spark,
      Seq((0L, "a b")).toDF("doc_id", "text"), "text", "doc_id", t, 0L,
      txnApp = Some("stats-app"), txn = Some(0L))
    run(); run()
    assert(VersionedTable.latestVersion(t) == 0L)
    assert(IncrementalStats.termStats(spark, t)
      .filter(col("term") === "a").head().getLong(1) == 1)
  }

  test("oovRate gates a drifted batch against the pinned vocabulary") {
    val t = freshTable()
    IncrementalStats.addBatch(spark,
      Seq((0L, "alpha beta gamma"), (1L, "beta delta")).toDF("doc_id", "text"),
      "text", "doc_id", t, 0L)
    val probe = Seq((10L, "alpha beta zeta"), (11L, "qq rr ss tt")).toDF("doc_id", "text")
    val got = IncrementalStats.oovRate(spark, probe, "text", "doc_id", t)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(10L) == ((3L, 1L, 0.333333)))
    assert(got(11L) == ((4L, 4L, 1.0)))
  }
}
