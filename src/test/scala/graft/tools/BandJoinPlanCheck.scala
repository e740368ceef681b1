package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot plan probe for the MinHash candidate join's build side
  * under pipeline-shaped probe lineage (the r14 estimate-flip class):
  * ingest docs whose snapshot DESCENDS from a corpus-scale scan + join
  * (the composed pipeline's docs checkpoint) for a few batches, then
  * print the executed plan of the ingest's index-side candidate join
  * and the bulk-regime band scan — is the INDEX leg ever the broadcast
  * build side?
  *
  * Usage: Test/runMain graft.tools.BandJoinPlanCheck <sfDir> <nBatches>
  */
object BandJoinPlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val idSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    def replica(i: Int) =
      if (i == 0) docs
      else docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * idSpan))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"~$i"))), " "))
    val t = java.nio.file.Files.createTempDirectory("graft-bandplan")
      .toString + "/index"
    val store = java.nio.file.Files.createTempDirectory("graft-bandstore")
      .toString + "/store"
    (0 until n).foreach { i =>
      // pipeline-shaped: the batch snapshot is a checkpoint whose
      // lineage is the documents scan (+ replica transform)
      val batch = replica(i)
        .select(col("doc_id").cast("long").as("__id"),
          col("text").as("__text"))
        .localCheckpoint()
      graft.sources.VersionedTable.commit(
        batch.select(col("__id").as("id"), col("__text").as("text")),
        store, "append", Some(i.toLong), Some("bandplan"),
        expectedVersion = None)
      val storeDf = graft.sources.VersionedTable.read(spark, store)
        .select(col("id").as("__id"), col("text").as("__text"))
      val res = graft.dedup.IncrementalMinHash.processBatch(spark, batch,
        "__text", "__id", t, storeDf, threshold = 0.3, batchId = i.toLong)
      res.write.mode("overwrite").format("noop").save()
      if (i == n - 1) {
        // rebuild the ingest's candidate join EXACTLY (bandRows inlined:
        // same banding arithmetic) from pipeline-lineage signatures and
        // print ITS plan — in processBatch the join hides behind the
        // cand checkpoint
        val probe = replica(i + 1)
          .select(col("doc_id").cast("long").as("__id"),
            col("text").as("__text"))
          .localCheckpoint()
        val k = 64; val bands = 16; val rows = k / bands
        val sigs = graft.dedup.Dedup.minhashSignatures(probe, "__text",
          "__id", k).localCheckpoint()
        val bb = sigs.select(col("id"),
            posexplode(transform(sequence(lit(0), lit(bands - 1)),
              b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
          .select(col("id"), col("pos").cast("int").as("band"),
            col("col").as("bucket"))
          .localCheckpoint()
        val idx = graft.sources.VersionedTable.read(spark, t)
        val cand = bb.join(
            idx.select(col("band"), col("bucket"), col("id").as("id_old")),
            Seq("band", "bucket"))
          .groupBy(col("id").as("id_new"), col("id_old"))
          .agg(count(lit(1)).as("n_shared_bands"))
        cand.write.mode("overwrite").format("noop").save()
        val plan = cand.queryExecution.executedPlan.toString
        System.err.println(s"CAND_JOIN_PLAN batch $i:\n" +
          plan.split("\n").filter(l => l.contains("Join") || l.contains("Broadcast")
            || l.contains("FileScan") || l.contains("ExistingRDD")
            || l.contains("Exchange") || l.contains("Sort "))
            .mkString("\n"))
      }
    }
    spark.stop()
  }
}
