package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, IncrementalDedup}
import graft.sources.VersionedTable

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-incdedup-spec")
      .toString + "/index"

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tonight") // J = 10/12 ≈ 0.833
  private val other = "completely different content about spark query engines and shuffles"
  private val third = "yet another unrelated paragraph describing immigration analytics fixtures"

  test("processBatch: within-batch clusters, index matches, precedence") {
    val t = freshTable()
    // batch 0: 0=base, 2=other, 4=base (within-batch exact dup of 0)
    val b0 = Seq((0L, base), (2L, other), (4L, base)).toDF("doc_id", "text")
    val r0 = IncrementalDedup.processBatch(spark, b0, "text", "doc_id",
        t, threshold = 0.5, batchId = 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(r0 == Map(
      0L -> (0L, "kept"), 2L -> (0L, "kept"), 4L -> (0L, "dup_within_batch")))

    // batch 1: 1=nearDup of indexed 0 (0.571 >= 0.5), 3=copy of indexed 2
    //          AND min of within-cluster {3, 9} (precedence check),
    //          5=fresh, 9=copy of 3
    val b1 = Seq((1L, nearDup), (3L, other), (5L, third), (9L, other))
      .toDF("doc_id", "text")
    val r1 = IncrementalDedup.processBatch(spark, b1, "text", "doc_id",
        t, threshold = 0.5, batchId = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(r1 == Map(
      1L -> (1L, "dup_of_index"), 3L -> (1L, "dup_of_index"),
      5L -> (1L, "kept"), 9L -> (1L, "dup_of_index")))

    // the index recorded every doc seen, both batches
    val idx = VersionedTable.read(spark, t)
    assert(idx.count() == 7)
    assert(idx.select("batch").distinct().as[Long].collect().toSet == Set(0L, 1L))
  }

  test("statuses are pinned to the pre-append index snapshot") {
    val t = freshTable()
    val b0 = Seq((0L, base), (2L, other)).toDF("doc_id", "text")
    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    val r0 = IncrementalDedup.processBatch(spark, b0, "text", "doc_id",
      t, threshold = 0.5, batchId = 0L)
    val r1 = IncrementalDedup.processBatch(spark, b1, "text", "doc_id",
      t, threshold = 0.5, batchId = 1L)
    // r0 is evaluated AFTER batch 1 committed; its docs must still be
    // statused against the EMPTY index batch 0 actually saw
    assert(r1.filter(col("status") === "dup_of_index").count() == 1)
    assert(r0.filter(col("status") === "dup_of_index").count() == 0)
    assert(r0.filter(col("status") === "kept").count() == 2)
  }

  test("(txnApp, txn) makes the index append idempotent under replay") {
    val t = freshTable()
    val b0 = Seq((0L, base), (2L, other)).toDF("doc_id", "text")
    def run() = IncrementalDedup.processBatch(spark, b0, "text", "doc_id",
      t, threshold = 0.5, batchId = 0L,
      txnApp = Some("ingest-app"), txn = Some(0L)).collect()
    val first = run().map(r => (r.getLong(0), r.getString(2))).toSet
    val replay = run().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(first == replay) // statuses are pure
    assert(VersionedTable.read(spark, t).count() == 2) // no second copy
  }

  test("crossPairs under the fixed hash order is complete vs brute force") {
    // adversarial corpus: heavy shingle overlap at varying sizes, so
    // prefixes are cut at different lengths on the two sides
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(seed: Int, len: Int): String =
      (0 until len).map(i => words((seed * 7 + i * 3) % words.size)).mkString(" ")
    val oldDocs = (0L until 12L).map(i => (i, doc(i.toInt, 6 + (i % 5).toInt)))
    val newDocs = (100L until 112L).map(i => (i, doc((i - 97).toInt, 5 + (i % 6).toInt)))
    val t = 0.5
    val oldRows = IncrementalDedup.indexRows(
      oldDocs.toDF("doc_id", "text"), "text", "doc_id", t)
    val newRows = IncrementalDedup.indexRows(
      newDocs.toDF("doc_id", "text"), "text", "doc_id", t)
    val got = IncrementalDedup.crossPairs(newRows, oldRows, t)
      .select("id_new", "id_old")
      .as[(Long, Long)].collect().toSet

    def sh(text: String): Set[String] = {
      val w = text.toLowerCase.split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val brute = (for {
      (ni, nt) <- newDocs; (oi, ot) <- oldDocs
      a = sh(nt); b = sh(ot)
      j = a.intersect(b).size.toDouble / a.union(b).size
      if j >= t
    } yield (ni, oi)).toSet
    assert(brute.nonEmpty, "degenerate test: no cross pairs at all")
    assert(got == brute)
  }

  test("batchPairs == brute force on seeded random corpora x threshold grid") {
    // adversarial generator: tiny vocab + geometric lengths forces
    // heavy shingle sharing, boundary-length docs (< 3 words), and
    // batch/index size asymmetry; seeded, so failures replay
    val rng = new scala.util.Random(421)
    val words = Seq("a", "b", "c", "d", "e", "f")
    def doc(): String = {
      val len = 1 + rng.nextInt(12)
      (0 until len).map(_ => words(rng.nextInt(words.size))).mkString(" ")
    }
    def sh(text: String): Set[String] = {
      val w = text.toLowerCase.split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    for (t <- Seq(0.3, 0.5, 0.8); trial <- 0 until 3) {
      val nNew = 8 + rng.nextInt(25)
      val nOld = rng.nextInt(25)
      val newDocs = (0L until nNew.toLong).map(i => (i, doc()))
      val oldDocs = (1000L until (1000L + nOld)).map(i => (i, doc()))
      val newRows = IncrementalDedup.indexRows(
        newDocs.toDF("doc_id", "text"), "text", "doc_id", t)
      val idx =
        if (nOld == 0) None
        else Some(IncrementalDedup.indexRows(
          oldDocs.toDF("doc_id", "text"), "text", "doc_id", t))
      val got = IncrementalDedup.batchPairs(newRows, idx, t)
        .select(col("id_new"), col("id_old"), col("within"))
        .as[(Long, Long, Boolean)].collect().toSet
      def j(a: Set[String], b: Set[String]): Double =
        a.intersect(b).size.toDouble / a.union(b).size
      val wantWithin = (for {
        (ia, ta) <- newDocs; (ib, tb) <- newDocs
        if ia < ib && j(sh(ta), sh(tb)) >= t
      } yield (ia, ib, true)).toSet
      val wantCross = (for {
        (ia, ta) <- newDocs; (ib, tb) <- oldDocs
        if j(sh(ta), sh(tb)) >= t
      } yield (ia, ib, false)).toSet
      assert(got == wantWithin ++ wantCross,
        s"t=$t trial=$trial nNew=$nNew nOld=$nOld: " +
          s"missing=${(wantWithin ++ wantCross) -- got} extra=${got -- (wantWithin ++ wantCross)}")
    }
  }

  test("batchPairs hot-token grid == brute force on planted stop-shingle corpora (VERDICT r9 #1)") {
    // every doc shares the 3-word window "zz yy xx" -> one shingle sits
    // in >50% of prefixes (short docs put most shingles in the prefix),
    // exactly the Zipf-hot bucket the grid path exists for. Tiny caps
    // force EVERY shared token through the grid; chunk sizes 1/2/3
    // exercise degenerate cells, and the index/no-index split covers
    // both rhs compositions.
    val rng = new scala.util.Random(777)
    val words = Seq("a", "b", "c", "d")
    def doc(): String = "zz yy xx " + (0 until (1 + rng.nextInt(10)))
      .map(_ => words(rng.nextInt(words.size))).mkString(" ")
    def sh(text: String): Set[String] = {
      val w = text.toLowerCase.split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    def j(a: Set[String], b: Set[String]): Double =
      a.intersect(b).size.toDouble / a.union(b).size
    for (t <- Seq(0.3, 0.6); (cap, chunk) <- Seq((1, 1), (2, 3), (3, 2));
         nOld <- Seq(0, 20)) {
      val newDocs = (0L until 25L).map(i => (i, doc()))
      val oldDocs = (1000L until (1000L + nOld)).map(i => (i, doc()))
      val newRows = IncrementalDedup.indexRows(
        newDocs.toDF("doc_id", "text"), "text", "doc_id", t)
      val idx =
        if (nOld == 0) None
        else Some(IncrementalDedup.indexRows(
          oldDocs.toDF("doc_id", "text"), "text", "doc_id", t))
      // maxHotCollect = 0 forces the distributed anti/semi-join
      // membership (the adversarial too-many-hot-tokens fallback);
      // the default exercises the inlined-isin path — both must agree
      // with brute force
      val mhc = if (chunk == 2) 0 else IncrementalDedup.DefaultMaxHotCollect
      val got = IncrementalDedup.batchPairs(newRows, idx, t,
          hotTokenCap = cap, hotChunk = chunk, maxHotCollect = mhc)
        .select(col("id_new"), col("id_old"), col("within"))
        .as[(Long, Long, Boolean)].collect().toSet
      val want = (for {
        (ia, ta) <- newDocs; (ib, tb) <- newDocs
        if ia < ib && j(sh(ta), sh(tb)) >= t
      } yield (ia, ib, true)).toSet ++ (for {
        (ia, ta) <- newDocs; (ib, tb) <- oldDocs
        if j(sh(ta), sh(tb)) >= t
      } yield (ia, ib, false)).toSet
      assert(want.exists(_._3), s"degenerate: no within pairs t=$t")
      assert(got == want,
        s"t=$t cap=$cap chunk=$chunk nOld=$nOld: " +
          s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("hot-token grid bounds shuffle volume on a planted stop-shingle corpus") {
    // 1200 docs ALL sharing one hot shingle, doc sizes spread wide so
    // the size-banded cells prune: the uncapped equi-join would drag
    // ~1200²/2 = 720k candidate rows through one bucket; the grid +
    // row-level positional/size pruning must stay well under that.
    val docs = (0L until 1200L).map { i =>
      val len = 3 + (i % 40L).toInt * 3 // sizes 3..120 words
      (i, "zz yy xx " + (0 until len).map(k => s"w${i}_$k").mkString(" "))
    }
    val t = 0.7
    val rows = IncrementalDedup.indexRows(
      docs.toDF("doc_id", "text"), "text", "doc_id", t).localCheckpoint()
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(l)
    val nPairs =
      try {
        val n = IncrementalDedup.batchPairs(rows, None, t,
          hotTokenCap = 64, hotChunk = 64).count()
        var prev = -1L; var stable = 0; var waited = 0
        while (stable < 3 && waited < 10000) {
          Thread.sleep(100); waited += 100
          val cur = acc.get
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        n
      } finally spark.sparkContext.removeSparkListener(l)
    assert(nPairs == 0L) // unique tails: nothing verifies
    val shuffled = acc.get
    val nTokens = rows.agg(sum(size(col("prefix")))).head.getLong(0)
    // tokens ride the exchange a bounded number of times (explodes,
    // freq counts, grid replication); the quadratic bucket would add
    // ~720k pair rows on top of the ~nTokens-scale traffic
    assert(shuffled < 12L * nTokens && shuffled < 300000L,
      s"hot-token ingest shuffled $shuffled records for $nTokens prefix tokens")
  }

  test("streamingSink: exactly-once statuses + index across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val t = freshTable()
    val resultsDir = java.nio.file.Files
      .createTempDirectory("graft-incdedup-stream").toString + "/results"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-incdedup-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = IncrementalDedup.streamingSink(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
        t, resultsDir, appId = "stream-app", threshold = 0.5)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((0L, base), (2L, other), (4L, base))
      q.processAllAvailable()
      mem.addData((1L, nearDup), (5L, third))
      q.processAllAvailable()
    } finally q.stop()

    val res = spark.read.parquet(resultsDir)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(res == Map(
      0L -> "kept", 2L -> "kept", 4L -> "dup_within_batch",
      1L -> "dup_of_index", 5L -> "kept"))
    // index holds every doc seen, once each, across both micro-batches
    assert(VersionedTable.read(spark, t).count() == 5)
    assert(VersionedTable.latestVersion(t) == 1L)

    // simulated checkpoint replay of micro-batch 1: same (appId, batchId)
    // txn → the partition is rewritten with identical statuses and the
    // index gains nothing
    val replayBatch = Seq((1L, nearDup), (5L, third)).toDF("doc_id", "text")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    IncrementalDedup.processBatch(spark, replayBatch, "text", "doc_id",
        t, threshold = 0.5, batchId = 1L,
        txnApp = Some("stream-app"), txn = Some(1L))
      .withColumn("__batch", lit(1L))
      .write.mode("overwrite").partitionBy("__batch").parquet(resultsDir)
    val replayed = spark.read.parquet(resultsDir)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(replayed == res)
    assert(VersionedTable.read(spark, t).count() == 5)
    assert(VersionedTable.latestVersion(t) == 1L)
  }
}
