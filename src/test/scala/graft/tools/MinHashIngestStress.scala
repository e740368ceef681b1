package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Trickle-regime stress for [[graft.dedup.IncrementalMinHash]] — the
  * same measurement [[TrickleIngestStress]] makes for the exact index:
  * a SMALL ingest against a growing MinHash index must cost O(batch +
  * matching buckets + candidates), not O(index). The index grows in
  * bulk replica steps while a fixed stream of TINY batches (10 docs,
  * one near-dup of an indexed doc planted in each) is timed at every
  * index size; each tiny ingest must still catch its planted dup, so
  * the bucket-pruned candidate join AND the candidate-pruned doc-store
  * verify fetch are exercised at every step — a flat curve means both
  * reads stay index-size-independent.
  *
  * Usage: Test/runMain graft.tools.MinHashIngestStress <sfDir> <growSteps> <tinyPerStep> <threshold>
  * Prints one JSON line tagged MINHASH_STRESS.
  */
object MinHashIngestStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val growSteps = if (args.length > 1) args(1).toInt else 5
    val tinyPerStep = if (args.length > 2) args(2).toInt else 8
    val t = if (args.length > 3) args(3).toDouble else 0.6
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
    // the durable doc store: every doc any step will ever index (the
    // verify fetch reads it candidate-pruned — its total size must not
    // matter, which is part of what the flat curve demonstrates)
    val store = (0 until growSteps).map(replica)
      .reduce(_.unionByName(_)).localCheckpoint()

    val dupSrc = docs.orderBy(col("doc_id")).limit(200)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def tiny(j: Int) = {
      val fresh = (0 until 9).map(k =>
        (1000000000L + j * 100L + k,
          (0 until 15).map(w => s"t${j}x${k}w$w").mkString(" ")))
      val dup = dupSrc(j % dupSrc.length)
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          (fresh :+ (1000000000L + j * 100L + 99L, dup._2)), 2))
        .toDF("doc_id", "text")
    }

    val table = java.nio.file.Files
      .createTempDirectory("graft-mh-stress").toString + "/index"
    val warm = java.nio.file.Files
      .createTempDirectory("graft-mh-warm").toString + "/index"
    graft.dedup.IncrementalMinHash.processBatch(spark, tiny(9999), "text",
        "doc_id", warm, store, t, 0L)
      .write.format("noop").mode("overwrite").save()

    var batchId = 0L
    var tinyId = 0
    val steps = (0 until growSteps).map { g =>
      graft.dedup.IncrementalMinHash.processBatch(spark, replica(g), "text",
          "doc_id", table, store, t, { batchId += 1; batchId })
        .write.format("noop").mode("overwrite").save()
      val idxRows = graft.sources.VersionedTable.read(spark, table).count()
      val times = (0 until tinyPerStep).map { _ =>
        tinyId += 1
        val b = tiny(tinyId)
        val t0 = System.nanoTime()
        val r = graft.dedup.IncrementalMinHash.processBatch(spark, b, "text",
            "doc_id", table, store, t, { batchId += 1; batchId })
          .collect()
        val dt = (System.nanoTime() - t0) / 1e9
        require(r.count(_.getString(2) == "dup_of_index") == 1,
          s"planted dup not caught at index=$idxRows")
        dt
      }
      (idxRows, times.sum / times.length, times.min)
    }

    val first = steps.head._2
    val last = steps.last._2
    val rows = steps.map { case (n, mean, mn) =>
      f"""{"index_rows":$n,"tiny_mean_sec":$mean%.3f,"tiny_min_sec":$mn%.3f}"""
    }.mkString("[", ",", "]")
    println(
      f"""MINHASH_STRESS {"sf":"$sfDir","grow_steps":$growSteps,"tiny_per_step":$tinyPerStep,"tiny_docs":10,"threshold":$t,"steps":$rows,"flatness_last_over_first":${last / first}%.3f}""")
    spark.stop()
  }
}
