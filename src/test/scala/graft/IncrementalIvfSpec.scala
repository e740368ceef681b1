package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{IncrementalIvf, Ivf, Similarity}
import graft.sources.VersionedTable

class IncrementalIvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-incivf-spec")
      .toString + "/index"

  private val d = "/root/testdata/sf0.001"

  test("appends never re-assign earlier batches; search over the index") {
    val emb = Tables.embeddings(spark, d)
    val b0 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b1 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val cents = Ivf.trainCentroids(b0, "embedding", "vec_id", nCells = 4, iters = 2)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, b0, "embedding", "vec_id", cents, t, 0L)
    val v0 = VersionedTable.readVersion(spark, t, 0L)
      .select(col("id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    IncrementalIvf.addBatch(spark, b1, "embedding", "vec_id", cents, t, 1L)

    val latest = VersionedTable.read(spark, t)
    assert(latest.count() == emb.count())
    // batch-0 rows are byte-for-byte the v0 rows — nothing was re-assigned
    val after = latest.filter(col("batch") === 0L)
      .select(col("id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(after == v0)

    // probing ALL cells makes IVF exact: must equal brute force
    val q = emb.filter(col("vec_id") === 1)
    val got = IncrementalIvf.searchTopK(spark, t, cents, q, "embedding",
        k = 5, nProbe = cents.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.bruteForceTopK(emb, "embedding", "vec_id",
        q, "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("(txnApp, txn) replay appends nothing; version pinning searches old snapshots") {
    val emb = Tables.embeddings(spark, d)
    val b0 = emb.filter(col("vec_id") < 20)
    val b1 = emb.filter(col("vec_id") >= 20 && col("vec_id") < 40)
    val cents = Ivf.trainCentroids(b0, "embedding", "vec_id", nCells = 2, iters = 1)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, b0, "embedding", "vec_id", cents, t, 0L,
      txnApp = Some("ivf-app"), txn = Some(0L))
    IncrementalIvf.addBatch(spark, b1, "embedding", "vec_id", cents, t, 1L,
      txnApp = Some("ivf-app"), txn = Some(1L))
    // replay of batch 0: skipped
    IncrementalIvf.addBatch(spark, b0, "embedding", "vec_id", cents, t, 0L,
      txnApp = Some("ivf-app"), txn = Some(0L))
    assert(VersionedTable.latestVersion(t) == 1L)
    assert(VersionedTable.read(spark, t).count() == 40)

    // a search pinned at v0 sees only batch 0
    val q = emb.filter(col("vec_id") === 0)
    val atV0 = IncrementalIvf.searchTopK(spark, t, cents, q, "embedding",
      k = 40, nProbe = cents.size, version = Some(0L))
    assert(atV0.count() == 20)
    assert(atV0.agg(max(col("id"))).head.getLong(0) < 20)
  }

  test("streamingSink: micro-batches append exactly-once; index queryable mid-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val emb = Tables.embeddings(spark, d)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (b0, b1) = rows.partition(_._1 % 2 == 0)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id", nCells = 2, iters = 1)
    val t = freshTable()
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-incivf-ckpt").toString
    val mem = MemoryStream[(Long, Array[Float])]
    val q = IncrementalIvf.streamingSink(
        mem.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
        cents, t, appId = "ivf-stream")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(b0.toSeq: _*)
      q.processAllAvailable()
      assert(VersionedTable.read(spark, t).count() == b0.length)
      mem.addData(b1.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.read(spark, t).count() == rows.length)
    assert(VersionedTable.latestVersion(t) == 1L)
    // simulated checkpoint replay of micro-batch 1: nothing appends
    IncrementalIvf.addBatch(spark,
      b1.toSeq.toDF("vec_id", "embedding"), "embedding", "vec_id",
      cents, t, 1L, txnApp = Some("ivf-stream"), txn = Some(1L))
    assert(VersionedTable.read(spark, t).count() == rows.length)
    assert(VersionedTable.latestVersion(t) == 1L)
  }

  test("retrain-and-cutover: drift flagged by assignStats, recall restored on a planted query (r11 #4)") {
    // planted geometry in 8-dim: two base clusters along axes e1 and
    // e2 (ids 0 and 1 lead them), and a DRIFTED cluster along the
    // diagonal (10,10,0,..) — exactly equidistant from both trained
    // centroids, with jitter alternating toward e1/e2 so its points
    // split across the two old cells. id 2 leads the drifted cluster
    // so the retrain's deterministic lowest-id init seeds all three
    // clusters.
    def vec(base: Array[Float], jitterDim: Int, jitter: Float) = {
      val v = base.clone(); v(jitterDim) += jitter; v
    }
    val e1 = Array.tabulate(8)(i => if (i == 0) 10f else 0f)
    val e2 = Array.tabulate(8)(i => if (i == 1) 10f else 0f)
    val diag = Array.tabulate(8)(i => if (i < 2) 10f else 0f)
    val a1 = (0 until 20).map(i =>
      ((if (i == 0) 0L else 10L + i), vec(e1, 2, 0.01f * (i % 5))))
    val a2 = (0 until 20).map(i =>
      ((if (i == 0) 1L else 40L + i), vec(e2, 3, 0.01f * (i % 5))))
    val drift = (0 until 20).map(i =>
      ((if (i == 0) 2L else 100L + i), vec(diag, i % 2, 0.1f)))
    val base = (a1 ++ a2).toDF("vec_id", "embedding")
    val drifted = drift.toDF("vec_id", "embedding")
    val all = (a1 ++ a2 ++ drift).toDF("vec_id", "embedding")

    val cents = Ivf.trainCentroids(base, "embedding", "vec_id",
      nCells = 2, iters = 2)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, base, "embedding", "vec_id", cents, t, 0L)
    IncrementalIvf.addBatch(spark, drifted, "embedding", "vec_id", cents, t, 1L)

    // the guard fires: the drifted batch sits ~10 away from either
    // pinned centroid while the base batches hug theirs
    val stats = IncrementalIvf.assignStats(spark, t, cents)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(stats(1L) > stats(0L) * 50,
      s"drift not flagged: $stats")

    // planted query along the diagonal; ground truth = the full brute
    // force over everything ingested
    val q = Seq((999L, diag)).toDF("vec_id", "embedding")
    val want = Similarity.bruteForceTopK(all, "embedding", "vec_id",
        q, "embedding", 20)
      .collect().map(_.getLong(0)).toSet
    assert(want == drift.map(_._1).toSet) // sanity: diag cluster wins

    // BEFORE retrain, nProbe=1 sees only the half of the drifted
    // cluster that fell into the probed cell — recall ~0.5
    val before = IncrementalIvf.searchTopK(spark, t, cents, q, "embedding",
        k = 20, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    val recallBefore = (before & want).size.toDouble / want.size
    assert(recallBefore <= 0.6, s"drift did not hurt recall: $recallBefore")

    // retrain on the full pinned snapshot, cut over, re-query
    val t2 = freshTable()
    val res = IncrementalIvf.retrain(spark, t, t2,
      nCells = 3, iters = 3, sampleFraction = 1.0)
    assert(res.sourceVersion == 1L)
    val after = IncrementalIvf.searchTopK(spark, t2, res.cents, q, "embedding",
        k = 20, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(after == want, s"retrain did not restore recall: " +
      s"missing=${want -- after} extra=${after -- want}")

    // the old index is untouched and still queryable; the new table's
    // centroid sidecar round-trips
    assert(VersionedTable.latestVersion(t) == 1L)
    assert(VersionedTable.read(spark, t).count() == 60)
    assert(IncrementalIvf.loadCentroids(spark,
      t2.stripSuffix("/") + "_centroids") == res.cents)
    assert(VersionedTable.read(spark, t2).count() == 60)
  }

  test("searchTopK pushes the probe-cell filter into the parquet scan (cell-clustered layout)") {
    val emb = Tables.embeddings(spark, d)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id", nCells = 4, iters = 2)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, emb, "embedding", "vec_id", cents, t, 0L)
    val q = emb.filter(col("vec_id") === 3)
    val res = IncrementalIvf.searchTopK(spark, t, cents, q, "embedding",
      k = 5, nProbe = 1)
    // the In(cell_id) predicate must reach the scan — with addBatch's
    // cell-clustered file layout that is row-group pruning, not a
    // post-scan filter over the whole index. (String form: under AQE the
    // scan sits inside AdaptiveSparkPlanExec, which collect{} can't enter.)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("In(cell_id") || plan.contains("EqualTo(cell_id"),
      s"probe filter not pushed to the scan:\n${plan.take(2000)}")
    // and the probe answer over one cell is still the exact top within it
    assert(res.collect().nonEmpty)
  }

  test("assignStats flags drift: shifted batch has larger mean distance") {
    val base = (0L until 30L)
      .map(i => (i, Array.fill(8)((i % 5).toFloat / 10f)))
    val shifted = (100L until 130L)
      .map(i => (i, Array.fill(8)(5f + (i % 5).toFloat / 10f)))
    val cents = Ivf.trainCentroids(base.toDF("vec_id", "embedding"),
      "embedding", "vec_id", nCells = 2, iters = 2)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, base.toDF("vec_id", "embedding"),
      "embedding", "vec_id", cents, t, 0L)
    IncrementalIvf.addBatch(spark, shifted.toDF("vec_id", "embedding"),
      "embedding", "vec_id", cents, t, 1L)
    val stats = IncrementalIvf.assignStats(spark, t, cents)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(stats(0L)._1 == 30 && stats(1L)._1 == 30)
    assert(stats(1L)._2 > stats(0L)._2 * 5,
      s"shifted batch should drift: $stats")
  }

  // ---- r13: incremental PQ codes beside the IVF cells (r12 #2) ---------

  test("incremental ADC == batch ivfPqTopK; the probe never reads the vectors") {
    val emb = Tables.embeddings(spark, d)
    val b0 = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b1 = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val cents = Ivf.trainCentroids(b0, "embedding", "vec_id",
      nCells = 8, iters = 0)
    val cb = graft.similarity.Pq.train(b0, "embedding", "vec_id", m = 8, k = 16)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, b0, "embedding", "vec_id", cents, t, 0L,
      codebook = Some(cb))
    IncrementalIvf.addBatch(spark, b1, "embedding", "vec_id", cents, t, 1L,
      codebook = Some(cb))

    val q = emb.filter(col("vec_id") === 0)
    val res = IncrementalIvf.searchTopKAdc(spark, t, cents, cb, q,
      "embedding", k = 10, nProbe = 4)
    // the two-batch incremental index answers exactly what the one-shot
    // batch composition answers (same pinned centroids + codebook)
    val qVec = q.select(Similarity.toDouble(col("embedding")))
      .head.getSeq[Double](0)
    val want = graft.similarity.Pq.ivfPqTopK(emb, "embedding", "vec_id",
        cents, cb, qVec, topK = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = res.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)

    // the scan reads (id, cell_id, codes) ONLY — `vec` is absent from
    // the read schema, so at 100 TB the probe never touches the floats
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    assert(plan.contains("In(cell_id") || plan.contains("EqualTo(cell_id"),
      plan.take(2000))
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("codes"), plan.take(2000))
    assert(!readSchema.contains("vec"), s"probe reads the floats: $readSchema")
  }

  test("a codeless index refuses codes-carrying appends (no silent null-codes mixing)") {
    // the natural upgrade mistake: start passing a codebook to an index
    // built without one. Mixed commits would give legacy rows
    // codes = null, whose null ADC distances sort NULLS FIRST into the
    // top-k — the append-schema contract refuses the commit instead.
    val emb = Tables.embeddings(spark, d)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 4, iters = 0)
    val cb = graft.similarity.Pq.train(emb, "embedding", "vec_id", m = 8, k = 16)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, emb.limit(40), "embedding", "vec_id",
      cents, t, 0L) // codeless
    val e = intercept[IllegalArgumentException] {
      IncrementalIvf.addBatch(spark, emb.limit(40), "embedding", "vec_id",
        cents, t, 1L, codebook = Some(cb))
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    assert(VersionedTable.latestVersion(t) == 0L)
    // the sanctioned upgrade is retrain(pq = ...) to a NEW table
  }

  test("codebook is pinned at first codes append; drift refuses loudly") {
    val emb = Tables.embeddings(spark, d)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 4, iters = 0)
    val cb = graft.similarity.Pq.train(emb, "embedding", "vec_id", m = 8, k = 16)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, emb.limit(40), "embedding", "vec_id",
      cents, t, 0L, codebook = Some(cb))
    // the pinned copy round-trips exactly
    assert(IncrementalIvf.loadCodebook(spark,
      IncrementalIvf.codebookTable(t)) == cb)
    // a different codebook (different subspace count) must refuse
    val cb2 = graft.similarity.Pq.train(emb, "embedding", "vec_id", m = 4, k = 16)
    val e = intercept[IllegalArgumentException] {
      IncrementalIvf.addBatch(spark, emb.limit(40), "embedding", "vec_id",
        cents, t, 1L, codebook = Some(cb2))
    }
    assert(e.getMessage.contains("codebook drift"))
    // the refused batch appended nothing
    assert(VersionedTable.latestVersion(t) == 0L)
  }

  test("retrain cuts codebook over with the centroids; new index answers ADC") {
    val emb = Tables.embeddings(spark, d)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 4, iters = 0)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, emb, "embedding", "vec_id", cents, t, 0L)
    val t2 = freshTable()
    val res = IncrementalIvf.retrain(spark, t, t2, nCells = 8, iters = 1,
      sampleFraction = 1.0, pq = Some(IncrementalIvf.PqSpec(m = 8, k = 16)))
    assert(res.codebook.isDefined)
    // pinned beside the new table, loadable, and consistent with the
    // returned copy
    assert(IncrementalIvf.loadCodebook(spark,
      IncrementalIvf.codebookTable(t2)) == res.codebook.get)
    // the new index carries codes and answers an ADC probe over all
    // cells == plain ADC over the re-encoded corpus (exact: every cell
    // probed, same codebook)
    val q = emb.filter(col("vec_id") === 2)
    val qVec = q.select(Similarity.toDouble(col("embedding")))
      .head.getSeq[Double](0)
    val got = IncrementalIvf.searchTopKAdc(spark, t2, res.cents,
        res.codebook.get, q, "embedding", k = 5, nProbe = res.cents.size)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = graft.similarity.Pq.adcTopK(
        graft.similarity.Pq.encode(emb, "embedding", "vec_id",
          res.codebook.get),
        "vec_id", res.codebook.get, qVec, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
    // post-cutover appends against the new pinned pair are accepted
    IncrementalIvf.addBatch(spark,
      emb.limit(10).withColumn("vec_id", col("vec_id") + 100000L),
      "embedding", "vec_id", res.cents, t2, 1L,
      codebook = res.codebook)
    assert(VersionedTable.latestVersion(t2) == res.newVersion + 1)
  }

  test("retrainInPlace: rows reassigned under a grown cell count; pinned reads resolve their own centroid era; dangling eras never validate") {
    val emb = Tables.embeddings(spark, d)
    val seed2 = Ivf.trainCentroids(emb.filter(col("vec_id") < 40),
      "embedding", "vec_id", nCells = 2, iters = 2)
    val t = freshTable()
    IncrementalIvf.seedCentroidsEra(spark, seed2, t)
    IncrementalIvf.addBatch(spark, emb.filter(col("vec_id") < 40),
      "embedding", "vec_id", seed2, t, 0L)
    IncrementalIvf.addBatch(spark,
      emb.filter(col("vec_id") >= 40 && col("vec_id") < 80),
      "embedding", "vec_id", seed2, t, 1L)
    val preVer = VersionedTable.latestVersion(t)
    assert(IncrementalIvf.activeCentroids(spark, t).size == 2)

    // grow 2 -> 6 cells in place
    val cents6 = IncrementalIvf.retrainInPlace(spark, t, nCells = 6,
      iters = 2, sampleFraction = 1.0)
    assert(cents6.size == 6)
    val post = VersionedTable.read(spark, t)
    assert(post.count() == 80L)
    // batch provenance preserved through the overwrite
    assert(post.select(col("batch")).distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
    // rows really were reassigned: every stored cell matches a fresh
    // assignment under the new centroids, and >2 cells are populated
    val mismatch = post.withColumn("__want",
        Ivf.assignCell(col("vec"), cents6))
      .filter(col("cell_id") =!= col("__want")).count()
    assert(mismatch == 0L)
    assert(post.select(col("cell_id")).distinct().count() > 2L)

    // era resolution: latest = the 6-cell era; the PRE-retrain pinned
    // version resolves the seed era, so an exact-copy probe of the old
    // snapshot still lands in the cell its rows were assigned under
    assert(IncrementalIvf.activeCentroids(spark, t).size == 6)
    val oldEra = IncrementalIvf.centroidsFor(spark, t, preVer)
    assert(oldEra == seed2, "pinned read resolved the wrong centroid era")
    // probe id offset from the indexed copy's: nearDupPairs excludes
    // same-id self matches by design
    val probe = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 1000L).as("pid"), col("embedding"))
    val hitOld = IncrementalIvf.nearDupPairs(spark, probe, "embedding",
        "pid", oldEra, t, threshold = 0.999, nProbe = 1,
        version = Some(preVer))
      .collect().map(_.getLong(1)).toSeq
    assert(hitOld == Seq(7L), s"old-era probe missed its exact copy: $hitOld")
    // and the post-retrain snapshot under the new era finds it too
    val hitNew = IncrementalIvf.nearDupPairs(spark, probe, "embedding",
        "pid", cents6, t, threshold = 0.999, nProbe = 1)
      .collect().map(_.getLong(1)).toSeq
    assert(hitNew == Seq(7L), s"new-era probe missed its exact copy: $hitNew")

    // DANGLING era (retrain crashed between sidecar and index commit):
    // an era tagged at the next index version, with no RetrainApp index
    // commit to validate it, must never win — even after an unrelated
    // append and a compactBy OVERWRITE occupy nearby slots
    val ct = IncrementalIvf.centroidsTable(t)
    val danglingTxn = VersionedTable.latestVersion(t) + 1
    VersionedTable.commit(
      Seq((0, Seq(9.0, 9, 9, 9))).toDF("cell_id", "values"),
      ct, "overwrite", Some(danglingTxn),
      Some(IncrementalIvf.RetrainApp), expectedVersion = None)
    assert(IncrementalIvf.activeCentroids(spark, t) == cents6,
      "a dangling era validated without its index commit")
    IncrementalIvf.addBatch(spark,
      emb.filter(col("vec_id") === 90), "embedding", "vec_id", cents6, t, 2L)
    assert(VersionedTable.latestVersion(t) == danglingTxn,
      "test setup: the append was supposed to occupy the dangling slot")
    assert(IncrementalIvf.activeCentroids(spark, t) == cents6,
      "an ordinary append at the dangling era's slot falsely validated it")
    VersionedTable.compactBy(spark, t)(df => df.coalesce(1))
    assert(IncrementalIvf.activeCentroids(spark, t) == cents6,
      "a compaction overwrite falsely validated a dangling era")

    // coded indexes refuse the in-place path loudly
    val tCoded = freshTable()
    val cb = graft.similarity.Pq.train(emb.filter(col("vec_id") < 40),
      "embedding", "vec_id", m = 4, k = 4, iters = 2)
    IncrementalIvf.addBatch(spark, emb.filter(col("vec_id") < 40),
      "embedding", "vec_id", seed2, tCoded, 0L, codebook = Some(cb))
    val refuse = intercept[IllegalArgumentException] {
      IncrementalIvf.retrainInPlace(spark, tCoded, nCells = 4, iters = 1,
        sampleFraction = 1.0)
    }
    assert(refuse.getMessage.contains("codes"), refuse.getMessage)
  }

  test("nearDupPairs: planted semantic near-dup flagged with exact cosine; nProbe bounds recall; version-pinned") {
    // two well-separated cells; planted vectors make every expected
    // cosine exact and deterministic
    val cents = Seq(Ivf.Centroid(0, Seq(1.0, 0.0, 0.0, 0.0)),
      Ivf.Centroid(1, Seq(0.0, 1.0, 0.0, 0.0)))
    val t = freshTable()
    val b0 = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),     // cell 0
      (2L, Array(0f, 1f, 0f, 0f)),     // cell 1
      (4L, Array(0.9f, 0.45f, 0f, 0f)) // cell 0 (closer to c0)
    ).toDF("vec_id", "embedding")
    IncrementalIvf.addBatch(spark, b0, "embedding", "vec_id", cents, t, 0L)

    // probe batch: 11 ~= doc 0's direction (cell 0, cos ~1); 13 is
    // equidistant-ish but lands cell 1, whose best neighbour is doc 2;
    // 15 is orthogonal to everything indexed in its cell (no flag)
    val probe = Seq(
      (11L, Array(0.99f, 0.01f, 0f, 0f)),
      (13L, Array(0f, 0.98f, 0.1f, 0f)),
      (15L, Array(0f, 0f, 1f, 0f))) // cell 0 or 1 by tie, cos 0 to all
      .toDF("vec_id", "embedding")
    val got = IncrementalIvf.nearDupPairs(spark, probe, "embedding",
        "vec_id", cents, t, threshold = 0.5, nProbe = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(11L, 13L), got)
    assert(got(11L)._1 == 0L && got(11L)._2 > 0.99, got(11L))
    assert(got(13L)._1 == 2L && got(13L)._2 > 0.9, got(13L))

    // recall is the nProbe contract: probe (0.6, 0.8) is ASSIGNED cell 1
    // (closer to c1), where its best neighbour is doc 2 (cos 0.8) — but
    // its true best is doc 4 (cos ~0.894) sitting in cell 0. nProbe=1
    // settles for doc 2; nProbe=2 finds doc 4.
    val cross = Seq((21L, Array(0.6f, 0.8f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val p1 = IncrementalIvf.nearDupPairs(spark, cross, "embedding",
        "vec_id", cents, t, threshold = 0.5, nProbe = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val p2 = IncrementalIvf.nearDupPairs(spark, cross, "embedding",
        "vec_id", cents, t, threshold = 0.5, nProbe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(p1.map(_._1).toSeq == Seq(2L), s"nProbe=1 should see only cell 1: $p1")
    assert(p2.map(_._1).toSeq == Seq(4L), s"nProbe=2 should find the cross-cell best: $p2")
    assert(p2.head._2 > p1.head._2,
      s"wider probe must strictly improve here: $p1 vs $p2")

    // version pinning: a probe pinned at version 0 ignores a later
    // append that contains an exact copy of the probe vector
    IncrementalIvf.addBatch(spark,
      Seq((30L, Array(0.99f, 0.01f, 0f, 0f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", cents, t, 1L)
    val pinned = IncrementalIvf.nearDupPairs(spark,
        probe.filter(col("vec_id") === 11L), "embedding", "vec_id",
        cents, t, threshold = 0.5, nProbe = 1, version = Some(0L))
      .collect().map(r => r.getLong(1)).toSeq
    assert(pinned == Seq(0L), s"pinned probe saw a post-pin append: $pinned")
    val unpinned = IncrementalIvf.nearDupPairs(spark,
        probe.filter(col("vec_id") === 11L), "embedding", "vec_id",
        cents, t, threshold = 0.5, nProbe = 1)
      .collect().map(r => r.getLong(1)).toSeq
    assert(unpinned == Seq(30L), s"latest probe missed the exact copy: $unpinned")

    // empty index: empty result, correct schema
    val none = IncrementalIvf.nearDupPairs(spark, probe, "embedding",
      "vec_id", cents, freshTable(), threshold = 0.5)
    assert(none.columns.toSeq == Seq("id", "near_id", "cos_sim"))
    assert(none.count() == 0L)
  }

  test("nearDupPairsAdc == float path; coarse scan never reads the floats; re-rank fetch candidate-pruned") {
    val emb = Tables.embeddings(spark, d)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 4, iters = 0)
    val cb = graft.similarity.Pq.train(emb, "embedding", "vec_id", m = 8, k = 16)
    val t = freshTable()
    IncrementalIvf.addBatch(spark,
      emb.filter(pmod(col("vec_id"), lit(2)) === 0), "embedding", "vec_id",
      cents, t, 0L, codebook = Some(cb))
    val probe = emb.filter(pmod(col("vec_id"), lit(2)) === 1)

    // with adcCandidates covering every same-cell candidate, the coded
    // two-phase gate re-ranks EXACTLY the float path's candidate set,
    // so results match row-for-row (the exact re-rank makes ADC noise
    // unable to flip a verdict — only the top-R cut can)
    val idxRows = VersionedTable.read(spark, t).count().toInt
    val gotAdc = IncrementalIvf.nearDupPairsAdc(spark, probe, "embedding",
        "vec_id", cents, t, threshold = 0.3, cb,
        adcCandidates = idxRows, nProbe = 2)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).sorted
    val gotFloat = IncrementalIvf.nearDupPairs(spark, probe, "embedding",
        "vec_id", cents, t, threshold = 0.3, nProbe = 2)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).sorted
    assert(gotAdc.nonEmpty && gotAdc.toSeq == gotFloat.toSeq,
      s"adc=${gotAdc.take(5).toSeq} float=${gotFloat.take(5).toSeq}")

    // the coarse leg reads (id, cell_id, codes) ONLY — the floats are
    // the scan cost at 100 TB and must be absent from its ReadSchema
    val coarsePlan = IncrementalIvf.lastAdcCoarseScan.get
      .queryExecution.executedPlan.toString
    val coarseSchema = "ReadSchema: [^\\n]*".r.findFirstIn(coarsePlan)
      .getOrElse("")
    assert(coarseSchema.contains("codes"), coarsePlan.take(2000))
    assert(!coarseSchema.contains("vec"),
      s"coarse scan reads the floats: $coarseSchema")
    // the re-rank leg reads floats for the SURVIVING candidates only:
    // id In-pushdown reaches the scan (bounded candidate set here)
    val rerankPlan = IncrementalIvf.lastAdcRerankScan.get
      .queryExecution.executedPlan.toString
    assert(rerankPlan.contains("In(id") || rerankPlan.contains("EqualTo(id"),
      rerankPlan.take(2000))

    // a small adcCandidates cut is the documented recall contract: a
    // probe may settle for a WORSE admissible neighbour (its ADC-top-1
    // needn't be its cosine-top-1), but it can never invent a flag for
    // a probe the full path cleared, and never report a cosine above
    // the full path's best for that probe
    val cut = IncrementalIvf.nearDupPairsAdc(spark, probe, "embedding",
        "vec_id", cents, t, threshold = 0.3, cb,
        adcCandidates = 1, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val fullBest = gotFloat.map(x => x._2 -> x._3).toMap
    assert(cut.keySet.subsetOf(fullBest.keySet),
      s"top-1 ADC cut flagged probes the full path cleared: ${cut.keySet -- fullBest.keySet}")
    cut.foreach { case (id, cos) =>
      assert(cos <= fullBest(id) + 1e-9,
        s"probe $id: cut cosine $cos beats the full path's best ${fullBest(id)}")
    }

    // codeless index refuses the coded gate
    val t2 = freshTable()
    IncrementalIvf.addBatch(spark, emb.limit(20), "embedding", "vec_id",
      cents, t2, 0L)
    val e = intercept[IllegalArgumentException] {
      IncrementalIvf.nearDupPairsAdc(spark, probe, "embedding", "vec_id",
        cents, t2, threshold = 0.3, cb)
    }
    assert(e.getMessage.contains("no PQ codes"), e.getMessage)
  }

  test("candidate join broadcasts the PROBE side, never the index leg (r13 gates-on drift, attributed r14)") {
    // the composed-pipeline probe shape that flipped the planner: a
    // docs snapshot DESCENDING from a corpus-scale scan + join inherits
    // a huge size estimate through its checkpoint, and estimate-driven
    // build-side choice then broadcast the growing INDEX leg — an
    // O(index)-per-batch term measured at +1 s/batch in the r13 gates
    // stress. probeSide pins the bounded micro-batch as build side.
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .join(Tables.embeddings(spark, d)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .localCheckpoint()
    val cents = Ivf.trainCentroids(Tables.embeddings(spark, d),
      "embedding", "vec_id", nCells = 2, iters = 2)
    val t = freshTable()
    IncrementalIvf.addBatch(spark, Tables.embeddings(spark, d),
      "embedding", "vec_id", cents, t, 0L)
    val res = IncrementalIvf.nearDupPairs(spark, docs, "embedding",
      "doc_id", cents, t, threshold = 0.999, nProbe = 1)
    res.write.mode("overwrite").format("noop").save()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("BuildLeft"),
      s"probe side must be the build side:\n${plan.take(3000)}")
    assert(!plan.contains("BuildRight"),
      s"index leg must never broadcast:\n${plan.take(3000)}")
  }

  test("probe-broadcast bound is byte-aware: a wide ADC LUT shrinks it; past it the gate stays correct (ADVICE r14)") {
    // the row bound alone only prices the FLOAT path's slim rows; the
    // coded coarse frame carries a per-row m×k LUT, so the effective
    // bound must shrink with the codebook or a near-row-bound batch
    // would broadcast hundreds of GB (m=64, k=256 → ~128 KB/row)
    val dim64 = Seq(Ivf.Centroid(0, Seq.fill(64)(0.0)))
    assert(IncrementalIvf.probeBroadcastRowBound(
      IncrementalIvf.floatProbeRowBytes(dim64))
      == IncrementalIvf.MaxProbeBroadcastRows,
      "a 64-dim float probe must keep the full row bound")
    val fatLut = 8L * 64 * 256 + 64 // adcProbeRowBytes at m=64, k=256
    val fatBound = IncrementalIvf.probeBroadcastRowBound(fatLut)
    assert(fatBound < 2048 && fatBound > 0,
      s"m=64,k=256 LUT rows must cap near 150MB/128KB: $fatBound")
    assert(fatBound * fatLut <= IncrementalIvf.MaxProbeBroadcastBytes)
    // monotone: wider rows never raise the bound
    assert(IncrementalIvf.probeBroadcastRowBound(fatLut * 2) <= fatBound)

    // past the bound the gate falls back to planner choice and must
    // return identical ROWS — batchRows is the caller-known count, so
    // an absurd value forces the fallback path deterministically
    val emb = Tables.embeddings(spark, d)
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 4, iters = 0)
    val cb = graft.similarity.Pq.train(emb, "embedding", "vec_id", m = 8, k = 16)
    val t = freshTable()
    IncrementalIvf.addBatch(spark,
      emb.filter(pmod(col("vec_id"), lit(2)) === 0), "embedding", "vec_id",
      cents, t, 0L, codebook = Some(cb))
    val probe = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    def rows(br: Option[Long]) = IncrementalIvf.nearDupPairsAdc(spark, probe,
        "embedding", "vec_id", cents, t, threshold = 0.3, cb,
        adcCandidates = 8, nProbe = 2, batchRows = br)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val pinned = rows(None)
    assert(pinned.nonEmpty)
    assert(rows(Some(Long.MaxValue / 4)) == pinned,
      "past-bound fallback changed the gate's rows")
    // float path: same fallback-correctness contract
    def fRows(br: Option[Long]) = IncrementalIvf.nearDupPairs(spark, probe,
        "embedding", "vec_id", cents, t, threshold = 0.3, nProbe = 2,
        batchRows = br)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(fRows(Some(Long.MaxValue / 4)) == fRows(None))
  }

  test("semanticAdmissionFraction: collapsed embeddings measure high, well-spread measure ~0") {
    val cents2 = Seq(Ivf.Centroid(0, Seq(0.0, 0.25, 0.5, 0.75)),
      Ivf.Centroid(1, Seq(1.0, 0.25, 0.5, 0.75)))
    // the degenerate regime from BENCH_PIPELINE_GATES_r13: a dense 1-D
    // grid in component 0 with 3 of 4 components shared by every doc —
    // any usable threshold admits a constant fraction of the corpus
    val tBad = freshTable()
    val bad = (0 until 200)
      .map(i => (i.toLong, Array((i % 100) / 100f, 0.25f, 0.5f, 0.75f)))
      .toDF("vec_id", "embedding")
    IncrementalIvf.addBatch(spark, bad, "embedding", "vec_id", cents2, tBad, 0L)
    val fBad = IncrementalIvf.semanticAdmissionFraction(spark, tBad, cents2,
      threshold = 0.999, sampleProbes = 64)
    assert(fBad > 0.05, s"collapsed space must measure dense: $fBad")

    // the real 64-dim embeddings: max cross-doc cosine ~0.51, so 0.999
    // admits essentially nothing
    val emb = Tables.embeddings(spark, d)
    val cents64 = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 2, iters = 2)
    val tGood = freshTable()
    IncrementalIvf.addBatch(spark, emb, "embedding", "vec_id", cents64,
      tGood, 0L)
    val fGood = IncrementalIvf.semanticAdmissionFraction(spark, tGood,
      cents64, threshold = 0.999, sampleProbes = 64)
    assert(fGood <= 0.05, s"well-spread space must measure sparse: $fGood")
    // empty index: 0.0, no probe
    assert(IncrementalIvf.semanticAdmissionFraction(spark, freshTable(),
      cents64, 0.999) == 0.0)
  }
}
