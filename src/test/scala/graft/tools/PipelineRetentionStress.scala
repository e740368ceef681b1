package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Directory-growth stress for the composed pipeline's maintenance
  * cadence (VERDICT r12 directive #6): without data compaction +
  * vacuum, N batches = N data dirs per table — file listings stay
  * bounded per-read (checkpoints), but the directory count itself
  * grows without bound. This drives `nBatches` small batches through
  * [[graft.pipelines.IngestPipeline.processBatch]] + `maintenance`
  * with `optimizeEvery`/`retainVersions` set, then reports per-table
  * data-dir counts and asserts the retention contract: a reader pinned
  * below the vacuum horizon fails LOUDLY (never a silent wrong
  * answer).
  *
  * Usage: Test/runMain graft.tools.PipelineRetentionStress <sfDir> <nBatches> <optimizeEvery> <retainVersions>
  * Prints one JSON line tagged RETENTION_STRESS.
  */
object PipelineRetentionStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = if (args.length > 1) args(1).toInt else 100
    val optimizeEvery = if (args.length > 2) args(2).toInt else 16
    val retain = if (args.length > 3) args(3).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val idSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1

    // nBatches disjoint-vocabulary slices (the IngestPipelineStress
    // replica trick, sliced): batch i takes rows [i*perBatch, ...) of a
    // token-suffixed replica so sizes stay equal and state accumulates
    def batchOf(i: Int) = docs
      .filter(pmod(col("doc_id"), lit(nBatches.toLong)) === i.toLong)
      .withColumn("doc_id", col("doc_id") + lit(i.toLong * idSpan))
      .withColumn("text", array_join(
        transform(split(col("text"), " "), w => concat(w, lit(s"~$i"))), " "))
      .withColumn("embedding", array(
        pmod(xxhash64(col("text")), lit(1000)).cast("double") / lit(1000.0),
        lit(0.25), lit(0.5), lit(0.75)))

    val root = java.nio.file.Files
      .createTempDirectory("graft-retention-stress").toString
    val cfg = graft.pipelines.IngestPipeline.Config(
      textCol = "text", idCol = "doc_id", embCol = "embedding",
      dedupIndex = s"$root/dedup", statsIndex = s"$root/stats",
      ivfIndex = s"$root/ivf", resultsDir = s"$root/results",
      appId = "retention-stress",
      centroids = Seq(graft.similarity.Ivf.Centroid(0, Seq(0.0, 0, 0, 0)),
        graft.similarity.Ivf.Centroid(1, Seq(1.0, 1, 1, 1))),
      threshold = 0.6, oovGate = 0.5,
      compactEvery = optimizeEvery,
      optimizeEvery = Some(optimizeEvery),
      retainVersions = Some(retain),
      // single-writer stream by construction — the safe regime for the
      // modulus cutover; this also keeps the auto-rebucket path under
      // stress every round (no-op while fill stays under target, which
      // the artifact reports via the final bucket count)
      autoRebucket = true)

    val t0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      graft.pipelines.IngestPipeline.processBatch(spark, batchOf(i), cfg,
          i.toLong)
        .write.mode("overwrite").partitionBy("__batch")
        .parquet(cfg.resultsDir)
      graft.pipelines.IngestPipeline.maintenance(spark, cfg, i.toLong)
    }
    val totalSec = (System.nanoTime() - t0) / 1e9

    def dataDirs(table: String): Int = {
      val p = java.nio.file.Paths.get(table, "data")
      if (!java.nio.file.Files.isDirectory(p)) 0
      else {
        val it = java.nio.file.Files.list(p)
        try it.filter(java.nio.file.Files.isDirectory(_)).count().toInt
        finally it.close()
      }
    }
    val tables = Map(
      "dedup" -> cfg.dedupIndex,
      "dedup_postings" -> graft.dedup.IncrementalDedup.postingsTable(cfg.dedupIndex),
      "dedup_tokfreq" -> graft.dedup.IncrementalDedup.tokenFreqTable(cfg.dedupIndex),
      "stats" -> cfg.statsIndex,
      "ivf" -> cfg.ivfIndex)
    val dirCounts = tables.map { case (k, t) => k -> dataDirs(t) }
    // bound: dirs per table stay O(optimizeEvery + retain), never O(nBatches)
    val bound = 2 * (optimizeEvery + retain) + 4
    val bounded = dirCounts.values.forall(_ <= bound)

    // retention contract: reading a vacuumed version fails loudly
    val failsLoudly =
      try {
        graft.sources.VersionedTable.readVersion(spark, cfg.dedupIndex, 0L)
          .count(); false
      } catch { case _: Throwable => true }

    // sanity: the live index is intact — row count equals docs ingested
    val idxRows = graft.sources.VersionedTable.read(spark, cfg.dedupIndex).count()
    val finalNb = graft.dedup.IncrementalDedup.readPostingsBuckets(
      graft.dedup.IncrementalDedup.postingsTable(cfg.dedupIndex)).getOrElse(-1)

    val dc = dirCounts.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(
      f"""RETENTION_STRESS {"sf":"$sfDir","n_batches":$nBatches,"optimize_every":$optimizeEvery,"retain_versions":$retain,"total_sec":$totalSec%.1f,"data_dirs":{$dc},"dir_bound":$bound,"dirs_bounded":$bounded,"vacuumed_read_fails_loudly":$failsLoudly,"final_index_rows":$idxRows,"final_postings_buckets":$finalNb}""")
    spark.stop()
  }
}
