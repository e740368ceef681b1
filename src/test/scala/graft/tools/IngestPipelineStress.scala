package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-batch-cost-vs-accumulated-state stress for the COMPOSED
  * [[graft.pipelines.IngestPipeline]] — the same question
  * [[IncDedupIngestStress]] answers for the dedup index alone, asked of
  * the whole four-artifact ingest: does batch N+1 cost what batch 2
  * cost, as the dedup index, tf sidecar, term-stats partials, IVF index
  * AND results directory all grow?
  *
  * Batch construction is the replica trick: every token suffixed by the
  * batch id, ids offset by the batch id — identical batch sizes and
  * dup densities, zero cross-batch shingles, so accumulated state is
  * the ONLY thing changing across the series. Embeddings are the same
  * synthetic 4-dim hash vectors q_ingest_pipeline uses.
  *
  * Two deliberate worst-case notes the analysis must carry:
  *   - disjoint per-batch vocabularies make the corpus vocabulary grow
  *     LINEARLY in batches (real corpora are Heaps-sublinear), so the
  *     OOV gate's vocab build side is as adversarial as it gets;
  *   - term-stats partials are compacted on the streamingSink's cadence
  *     rule (here every 8 batches, documented in the artifact) so the
  *     partials-merge read cost resets exactly as production would.
  *
  * Usage: Test/runMain graft.tools.IngestPipelineStress <sfDir> <nBatches> <threshold> [exact|minhash] [gates|codedgates|sem|contam] [scope|noscope]
  * Prints one JSON line tagged PIPELINE_STRESS. `minhash` swaps the
  * dedup stage to the banded index + pipeline-maintained doc store
  * (five artifacts) — same replica corpus, so the two backends' curves
  * are directly comparable. `gates` additionally enables the SEMANTIC
  * near-dup gate (probe vs the pinned kept-corpus IVF index) and the
  * DECONTAMINATION gate (a 100-doc bench fingerprint index built once
  * from the base corpus) — the everything-on configuration.
  *
  * r14 attribution instrumentation (VERDICT r13 #1): per-batch STAGE
  * timings (processBatch's onStage hook), cumulative GC time, used
  * heap, and the persisted-RDD count after each batch — enough to tell
  * an algorithmic ramp (one stage grows) from a lifecycle leak (flat
  * stages, growing persisted-RDD count, GC-coupled total). `scope`
  * (default) wraps each batch in [[graft.sources.CheckpointScope]],
  * the production streamingSink lifecycle; `noscope` reproduces the
  * pre-r14 leak for attribution.
  */
object IngestPipelineStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val t = if (args.length > 2) args(2).toDouble else 0.6
    val backend = if (args.length > 3) args(3) else "exact"
    require(backend == "exact" || backend == "minhash", backend)
    val gateArg = if (args.length > 4) args(4) else "off"
    val semOn = gateArg == "gates" || gateArg == "sem" ||
      gateArg == "codedgates"
    val contamOn = gateArg == "gates" || gateArg == "contam" ||
      gateArg == "codedgates"
    // codedgates: the everything-on configuration with the SEMANTIC
    // gate on the CODED path — IVF appends store PQ codes, the gate
    // runs the codes-only coarse ADC + exact re-rank (r14)
    val codedOn = gateArg == "codedgates"
    val gates = semOn || contamOn
    val scoped = !(args.length > 5 && args(5) == "noscope")
    val compactEvery = 8
    // STRESS_NCELLS (gates modes): IVF cell count for the pinned index.
    // Default 2 = the historical fixed-cell stress (the UNMANAGED term
    // the cell-fill cadence exists to bound). The decade scaling run
    // (VERDICT r14 #5) sets it proportional to the corpus at each scale
    // so both scales run at equal per-cell fill — the configuration the
    // advisory loop maintains in production.
    val stressCells = sys.env.get("STRESS_NCELLS").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark) // incl. In-pushdown threshold

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val idSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1

    // gates mode swaps the synthetic 4-dim hash embedding for the REAL
    // 64-dim embeddings table (joined by base doc id): the hash
    // embedding's first component is a dense 1-D grid, so ANY usable
    // cosine threshold admits ~10% of the corpus per probe - a
    // degenerate semantic-gate regime that measures window-shuffle
    // volume, not the gate (found by this stress; the oracle queries
    // always used the real table). Replicas share their base doc's
    // vector, so cross-batch semantic matches are exact copies - the
    // sparse-match regime the gate is for.
    lazy val realEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("__base"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("embedding"))
      .localCheckpoint()
    def replica(i: Int) = {
      val base =
        if (i == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * idSpan))
          .withColumn("text", array_join(
            transform(split(col("text"), " "),
              w => concat(w, lit(s"~$i"))), " "))
      if (gates)
        base.withColumn("__base", pmod(col("doc_id"), lit(idSpan)))
          .join(realEmb, Seq("__base")).drop("__base")
      else base.withColumn("embedding", array(
        pmod(xxhash64(col("text")), lit(1000)).cast("double") / lit(1000.0),
        lit(0.25), lit(0.5), lit(0.75)))
    }

    // gates mode: one bench fingerprint index, built once from the base
    // corpus's first 100 docs (the eval set changes rarely — exactly the
    // build-once/probe-many contract)
    lazy val benchIndexDir = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-pipe-bench").toString + "/bench"
      graft.dedup.Decontaminate.buildBenchIndex(spark,
        docs.filter(col("doc_id") < 100), "text", "doc_id", dir)
      dir
    }

    def freshCfg(root: String) = graft.pipelines.IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "pipe-stress",
      centroids =
        if (gates) graft.similarity.Ivf.trainCentroids(
          realEmb.withColumnRenamed("__base", "vec_id"), "embedding",
          "vec_id", nCells = stressCells, iters = 2)
        else Seq(graft.similarity.Ivf.Centroid(0, Seq(0.0, 0, 0, 0)),
          graft.similarity.Ivf.Centroid(1, Seq(1.0, 1, 1, 1))),
      threshold = t, oovGate = 0.5,
      dedupBackend =
        if (backend == "minhash")
          graft.pipelines.IngestPipeline.DedupBackend.MinHash()
        else graft.pipelines.IngestPipeline.DedupBackend.Exact,
      docStore =
        if (backend == "minhash") Some(s"$root/docstore") else None,
      semanticThreshold = if (semOn) Some(0.999) else None,
      benchIndex = if (contamOn) Some(benchIndexDir) else None,
      pqCodebook =
        if (codedOn) Some(graft.similarity.Pq.train(
          realEmb.withColumnRenamed("__base", "vec_id"), "embedding",
          "vec_id", m = 8, k = 16))
        else None,
      adcCandidates = 32)

    // warm the JVM/codegen on a throwaway root so batch 0 isn't janino
    val warm = freshCfg(java.nio.file.Files
      .createTempDirectory("graft-pipe-warm").toString)
    graft.pipelines.IngestPipeline.processBatch(spark, replica(0), warm, 0L)
      .write.mode("overwrite").partitionBy("__batch").parquet(warm.resultsDir)

    // CODED_CUTOVER_AT=<k> (codedgates only): after batch k, run the
    // sanctioned coded cutover (retrainCodedIvf to a fresh table with
    // cells scaled to the accumulated corpus) and continue the series
    // under the successor Config — the r15 directive's ramp-reset
    // measurement: the sem stage's per-batch cost grows with per-cell
    // candidates at fixed cells, and the cutover's grown cell count
    // must pull it back to the early-series level.
    val cutoverAt = sys.env.get("CODED_CUTOVER_AT").map(_.toInt)
    var cutoverSec = -1.0
    var cellsBefore = -1; var cellsAfter = -1
    var cfg = freshCfg(java.nio.file.Files
      .createTempDirectory("graft-pipe-stress").toString)
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val stageNames = Seq("snapshot", "oov", "dedup", "kept", "stats_ivf",
      "sem", "contam", "write", "compact")
    val probeIso = Seq.newBuilder[Double]
    val probeDocs = Seq.newBuilder[Double]
    val probePinned = Seq.newBuilder[Double]
    val stageSeries = stageNames.map(_ -> Seq.newBuilder[Double]).toMap
    val gcSeries = Seq.newBuilder[Double]
    val heapSeries = Seq.newBuilder[Long]
    val rddSeries = Seq.newBuilder[Int]
    val times = (0 until nBatches).map { i =>
      val stages = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      def body(): Unit = {
        val rec = graft.pipelines.IngestPipeline.processBatch(spark,
          replica(i), cfg, i.toLong,
          onStage = Some((n, s) => stages(n) += s))
        val w0 = System.nanoTime()
        rec.write.mode("overwrite").partitionBy("__batch")
          .parquet(cfg.resultsDir)
        stages("write") += (System.nanoTime() - w0) / 1e9
        if (i % compactEvery == compactEvery - 1) {
          val c0 = System.nanoTime()
          graft.dedup.IncrementalDedup.compactTokenFreq(spark, cfg.dedupIndex)
          graft.text.IncrementalStats.compact(spark, cfg.statsIndex)
          stages("compact") += (System.nanoTime() - c0) / 1e9
        }
      }
      if (scoped)
        graft.sources.CheckpointScope.withScope(spark.sparkContext)(body())
      else body()
      val dur = (System.nanoTime() - t0) / 1e9
      // in-situ differential (r14 bisect): probe the PIPELINE's ivf
      // index with an isolated bisect-style probe frame — if this grows
      // with the composed sem stage, the index side is the term; if it
      // stays flat, the composed probe INPUT is
      if (semOn && sys.env.contains("SEMGATE_DIFFERENTIAL")) {
        val probe = realEmb
          .select((col("__base") + lit((i + 1).toLong * 1000000L)).as("vec_id"),
            col("embedding"))
          .localCheckpoint()
        val p0 = System.nanoTime()
        graft.similarity.IncrementalIvf.nearDupPairs(spark, probe,
            "embedding", "vec_id", cfg.centroids, cfg.ivfIndex,
            threshold = 0.999, nProbe = 1)
          .write.mode("overwrite").format("noop").save()
        probeIso += (System.nanoTime() - p0) / 1e9
        // variant 2: the COMPOSED probe frame shape (docs snapshot with
        // text), latest version
        val docsLike = replica(i)
          .select(col("doc_id").cast("long").as("__id"),
            col("text").as("__text"), col("embedding").as("__emb"))
          .localCheckpoint()
        val p1 = System.nanoTime()
        graft.similarity.IncrementalIvf.nearDupPairs(spark, docsLike,
            "__emb", "__id", cfg.centroids, cfg.ivfIndex,
            threshold = 0.999, nProbe = 1)
          .write.mode("overwrite").format("noop").save()
        probeDocs += (System.nanoTime() - p1) / 1e9
        // variant 3: iso frame, version PINNED one below latest (the
        // composed pin rule)
        val latest = graft.sources.VersionedTable.latestVersion(cfg.ivfIndex)
        val p2 = System.nanoTime()
        graft.similarity.IncrementalIvf.nearDupPairs(spark, probe,
            "embedding", "vec_id", cfg.centroids, cfg.ivfIndex,
            threshold = 0.999, nProbe = 1,
            version = Some(math.max(0L, latest - 1)))
          .write.mode("overwrite").format("noop").save()
        probePinned += (System.nanoTime() - p2) / 1e9
        if (i == nBatches - 1) {
          val pairsDocs = graft.similarity.IncrementalIvf.nearDupPairs(spark,
            docsLike, "__emb", "__id", cfg.centroids, cfg.ivfIndex,
            threshold = 0.999, nProbe = 1)
          val pairsIso = graft.similarity.IncrementalIvf.nearDupPairs(spark,
            probe, "embedding", "vec_id", cfg.centroids, cfg.ivfIndex,
            threshold = 0.999, nProbe = 1)
          System.err.println(s"DIFF_COUNTS docs=${docsLike.count()} " +
            s"iso=${probe.count()} pairsDocs=${pairsDocs.count()} " +
            s"pairsIso=${pairsIso.count()} " +
            s"ivfRows=${graft.sources.VersionedTable.read(spark, cfg.ivfIndex).count()}")
          System.err.println("DOCS PLAN:")
          pairsDocs.explain()
          System.err.println("ISO PLAN:")
          pairsIso.explain()
        }
      }
      stageNames.foreach(n => stageSeries(n) += stages(n))
      gcSeries += (gcMillis - gc0) / 1e3
      val rt = Runtime.getRuntime
      heapSeries += (rt.totalMemory() - rt.freeMemory()) >> 20
      rddSeries += spark.sparkContext.getPersistentRDDs.size
      if (codedOn && cutoverAt.contains(i)) {
        // between-batch = a quiesce for this serial harness (no
        // streaming checkpoint can replay a pre-cutover batch)
        val c0 = System.nanoTime()
        val rows = graft.sources.VersionedTable.read(spark, cfg.ivfIndex)
          .count()
        cellsBefore = cfg.centroids.size
        // the SHIPPED advisory policy: the two-term optimum
        // cells* = sqrt(b·rows/a) (CodedFillStats.optimalCells, r16) —
        // the linear cells-track-corpus rule this replaces chose 4×
        // past the fitted optimum at sf1 and turned the cutover into a
        // wash (BENCH_CODED_CUTOVER_SF1_r15). CUTOVER_NCELLS overrides
        // for explicit control runs.
        cellsAfter = sys.env.get("CUTOVER_NCELLS").map(_.toInt).getOrElse(
          graft.pipelines.IngestPipeline.CodedFillStats(
            cfg.ivfIndex, rows, cellsBefore,
            rows.toDouble / math.max(1, cellsBefore),
            bound = 1L, batchId = i.toLong).optimalCells)
        cfg = graft.pipelines.IngestPipeline.retrainCodedIvf(spark, cfg,
          cfg.ivfIndex.stripSuffix("/") + s"-cut$i", nCells = cellsAfter,
          iters = 2, sampleFraction = math.min(1.0, 50000.0 / rows),
          pq = graft.similarity.IncrementalIvf.PqSpec(m = 8, k = 16))
        cutoverSec = (System.nanoTime() - c0) / 1e9
        System.err.println(f"CUTOVER after batch $i: $rows rows, " +
          f"$cellsBefore -> $cellsAfter cells, $cutoverSec%.2f s")
      }
      dur
    }

    val dedupRows = graft.sources.VersionedTable.read(spark, cfg.dedupIndex).count()
    val ivfRows = graft.sources.VersionedTable.read(spark, cfg.ivfIndex).count()
    val vocab = graft.text.IncrementalStats.termStats(spark, cfg.statsIndex, None)
      .count()
    val results = spark.read.parquet(cfg.resultsDir).count()
    val firstHalf = times.take(nBatches / 2).sum / (nBatches / 2)
    val secondHalf = times.drop(nBatches / 2).sum / (nBatches - nBatches / 2)
    val ts = times.map(x => f"$x%.3f").mkString("[", ",", "]")
    def fmtD(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("[", ",", "]")
    val stagesJson = (stageNames
      .map(n => s""""$n":${fmtD(stageSeries(n).result())}""")
      :+ s""""probe_iso":${fmtD(probeIso.result())}"""
      :+ s""""probe_docs":${fmtD(probeDocs.result())}"""
      :+ s""""probe_pinned":${fmtD(probePinned.result())}""")
      .mkString("{", ",", "}")
    val cutJson = cutoverAt.fold("")(k =>
      f""""cutover_at":$k,"cutover_sec":$cutoverSec%.2f,"cells_before":$cellsBefore,"cells_after":$cellsAfter,""")
    println(
      f"""PIPELINE_STRESS {$cutJson"sf":"$sfDir","backend":"$backend","gates":"$gateArg","cells":$stressCells,"scoped":$scoped,"n_batches":$nBatches,"threshold":$t,"compact_every":$compactEvery,"final_dedup_rows":$dedupRows,"final_ivf_rows":$ivfRows,"final_vocab_terms":$vocab,"final_result_rows":$results,"per_batch_sec":$ts,"stages_sec":$stagesJson,"gc_sec":${fmtD(gcSeries.result())},"heap_mb":${heapSeries.result().mkString("[", ",", "]")},"persisted_rdds":${rddSeries.result().mkString("[", ",", "]")},"mean_first_half":$firstHalf%.3f,"mean_second_half":$secondHalf%.3f,"ramp_ratio":${secondHalf / firstHalf}%.3f}""")
    spark.stop()
  }
}
