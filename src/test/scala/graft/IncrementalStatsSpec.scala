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

  test("oovRate under a Zipf-hot token: broadcast on the designed path; AQE skew-split when the vocab must shuffle (r11 #7)") {
    val t = freshTable()
    // vocabulary of 200 terms
    IncrementalStats.addBatch(spark,
      Seq((0L, (0 until 200).map(i => s"w$i").mkString(" ")))
        .toDF("doc_id", "text"),
      "text", "doc_id", t, 0L)
    // Zipf-hot probe: 6000 docs of 10x a single UNSEEN token — 60k join
    // rows on ONE key, spread over many source partitions (AQE's skew
    // split works at mapper-range granularity, so a hot key born on a
    // single mapper is unsplittable; a real Zipf head never is) — plus
    // one doc with a known mix
    val probe = ((100L until 6100L).map(i =>
        (i, (0 until 10).map(_ => "zzhot").mkString(" "))) :+
        (2L, "w0 w1 w2 unseen"))
      .toDF("doc_id", "text").repartition(8).localCheckpoint()
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val got = df.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      assert(got.size == 6001)
      assert(got(2L) == ((4L, 1L, 0.25)))
      assert(got(100L) == ((10L, 10L, 1.0)))
      assert((100L until 6100L).forall(i => got(i) == ((10L, 10L, 1.0))))
    }

    // designed path: the join side is the VOCAB (broadcast-sized), so
    // the token stream is never exchanged by term — a hot term cannot
    // skew a partition that does not exist
    val designed = IncrementalStats.oovRate(spark, probe, "text", "doc_id", t)
    check(designed)
    designed.queryExecution.toRdd.foreach(_ => ())
    assert(designed.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      designed.queryExecution.executedPlan.toString.take(2000))

    // forced-shuffle regime (a vocabulary past the broadcast threshold
    // at 100 TB): the hot term concentrates one reduce partition, and
    // AQE CANNOT split it — the vocab side feeds the join straight out
    // of its distinct aggregate, so no shuffle stage sits directly
    // beneath the join for OptimizeSkewedJoin to re-split (this test
    // originally asserted skew=true and proved the opposite). The
    // salted variant is the structural fix: the join key gains the doc
    // salt, so the hot term spreads across `salts` reducers by
    // construction.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // plain path stays CORRECT under forced shuffle (just skewed)
      check(IncrementalStats.oovRate(spark, probe, "text", "doc_id", t))
      // salted path: identical results, join keyed on (term, __salt)
      val salted = IncrementalStats.oovRateSalted(spark, probe, "text",
        "doc_id", t, salts = 8)
      check(salted)
      val plan = salted.queryExecution.executedPlan.toString
      assert("hashpartitioning\\(term#\\d+, __salt#\\d+".r
        .findFirstIn(plan).nonEmpty, plan.take(2500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
