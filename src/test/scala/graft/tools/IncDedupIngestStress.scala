package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest-cost-vs-index-size stress for [[graft.dedup.IncrementalDedup]]
  * (VERDICT r11 directive #1c): ingest `nBatches` equal-sized batches
  * into ONE index and time every ingest. Each batch is a replica of the
  * source documents with every token suffixed by the batch id (the
  * [[DedupStressGen]] trick) — so batch sizes and dup densities are
  * identical, no shingle crosses batches, and the ONLY thing that
  * changes from ingest to ingest is the size of the index already
  * accumulated. A per-ingest cost with an O(index) term shows up as a
  * linear ramp across the series; the maintained count-table + hint
  * design should hold the series flat (modulo the commit-log tail and
  * fs constants).
  *
  * Also times, at the FINAL index size, the eager hot-detection phase
  * of batchPairs in count-table mode vs recount mode — the direct
  * measurement of what the count table buys.
  *
  * Usage: Test/runMain graft.tools.IncDedupIngestStress <sfDir> <nBatches> <threshold>
  * Prints one JSON line tagged INGEST_STRESS.
  */
object IncDedupIngestStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val t = if (args.length > 2) args(2).toDouble else 0.6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark) // incl. In-pushdown threshold

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val idSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1

    def replica(i: Int) =
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * idSpan))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            w => concat(w, lit(s"~$i"))), " "))

    val table = java.nio.file.Files
      .createTempDirectory("graft-ingest-stress").toString + "/index"

    // warm the JVM/codegen on a throwaway table so ingest 0 isn't
    // measuring janino
    val warmTable = java.nio.file.Files
      .createTempDirectory("graft-ingest-warm").toString + "/index"
    graft.dedup.IncrementalDedup.processBatch(spark, replica(0), "text",
      "doc_id", warmTable, t, 0L).write.format("noop").mode("overwrite").save()

    val times = (0 until nBatches).map { i =>
      val t0 = System.nanoTime()
      graft.dedup.IncrementalDedup.processBatch(spark, replica(i), "text",
        "doc_id", table, t, i.toLong)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // eager hot-detection phase at the FINAL index size: count-table
    // mode (what ingest N+1 pays) vs recount mode (what it paid pre-r11)
    val probe = graft.dedup.IncrementalDedup.indexRows(
      replica(0).withColumn("doc_id", col("doc_id") + lit(nBatches.toLong * idSpan))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            w => concat(w, lit("~probe"))), " ")),
      "text", "doc_id", t).localCheckpoint()
    val idx = graft.sources.VersionedTable.read(spark, table)
      .select(col("id"), col("sz"), col("sh"), col("shh"), col("prefix"))
    val cnts = graft.dedup.IncrementalDedup.tokenCounts(spark, table)
    def timePlanBuild(counts: Option[org.apache.spark.sql.DataFrame]): Double = {
      val t0 = System.nanoTime()
      // cap=1 forces detection to run its eager collect (nothing is
      // provably cold); the returned plan is NOT executed — this times
      // exactly the per-ingest eager phase
      graft.dedup.IncrementalDedup.batchPairs(probe, Some(idx), t,
        hotTokenCap = 1, hotChunk = 1024,
        maxHotCollect = graft.dedup.IncrementalDedup.DefaultMaxHotCollect,
        indexTokenCounts = counts, graft.dedup.IncrementalDedup.HotInputs())
      (System.nanoTime() - t0) / 1e9
    }
    val detectRecount = timePlanBuild(None)
    val detectCounts = timePlanBuild(Some(cnts))

    val idxRows = graft.sources.VersionedTable.read(spark, table).count()
    val firstHalf = times.take(nBatches / 2).sum / (nBatches / 2)
    val secondHalf = times.drop(nBatches / 2).sum / (nBatches - nBatches / 2)
    val ts = times.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(
      f"""INGEST_STRESS {"sf":"$sfDir","n_batches":$nBatches,"threshold":$t,"final_index_rows":$idxRows,"per_ingest_sec":$ts,"mean_first_half":$firstHalf%.3f,"mean_second_half":$secondHalf%.3f,"ramp_ratio":${secondHalf / firstHalf}%.3f,"hot_detect_sec_counts":$detectCounts%.3f,"hot_detect_sec_recount":$detectRecount%.3f}""")
    spark.stop()
  }
}
