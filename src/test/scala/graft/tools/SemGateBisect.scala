package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.{IncrementalIvf, Ivf}
import graft.sources.VersionedTable

/** Bisect harness for the composed-pipeline semantic-gate drift
  * (VERDICT r13 #1, attributed to the `sem` stage by the r14
  * stage-timed IngestPipelineStress run): reproduce EXACTLY the
  * composed gate's probe configuration — real 64-dim embeddings
  * replicated with offset ids (cross-batch exact copies), 2 centroids
  * trained iters=2, threshold 0.999, nProbe 1, version-pinned reads —
  * and at several index sizes time the probe's sub-stages separately:
  *
  *   - full:    nearDupPairs materialized (threshold + top-1 window)
  *   - nowin:   candidate pairs + cosine + threshold, no window
  *   - nocos:   candidate join row count only (no cosine arithmetic)
  *   - rep2/3:  the full probe re-run at the SAME index size (JVM/state
  *              effects show here; an algorithmic term repeats)
  *
  * Usage: Test/runMain graft.tools.SemGateBisect <sfDir> <nSteps> <batchesPerStep>
  * Prints one JSON line tagged SEMGATE_BISECT.
  */
object SemGateBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nSteps = if (args.length > 1) args(1).toInt else 5
    val per = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .localCheckpoint()
    val idSpan = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    def replica(i: Int) = emb
      .withColumn("vec_id", col("vec_id") + lit(i.toLong * idSpan))
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 2, iters = 2)
    val t = java.nio.file.Files.createTempDirectory("graft-sembisect")
      .toString + "/index"

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val sb = new StringBuilder
    var batch = 0
    (0 until nSteps).foreach { step =>
      (0 until per).foreach { _ =>
        IncrementalIvf.addBatch(spark, replica(batch), "embedding",
          "vec_id", cents, t, batch.toLong)
        batch += 1
      }
      val probe = replica(batch).localCheckpoint() // fresh ids, same vectors
      val rows = VersionedTable.read(spark, t).count()
      def full() = timeIt(
        IncrementalIvf.nearDupPairs(spark, probe, "embedding", "vec_id",
            cents, t, threshold = 0.999, nProbe = 1)
          .write.mode("overwrite").format("noop").save())
      // candidate stage without the window: same join, cosine, filter
      val q = probe
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("__q"))
        .withColumn("cell_id",
          explode(Ivf.probeCells(col("__q"), cents, 1)))
        .withColumn("__qn",
          sqrt(aggregate(transform(col("__q"), x => x * x), lit(0.0), _ + _)))
        .localCheckpoint()
      val idx = VersionedTable.read(spark, t)
        .select(col("id").as("near_id"), col("cell_id"), col("vec"))
      val nowinT = timeIt(
        q.join(idx, Seq("cell_id"))
          .filter(col("near_id") =!= col("id"))
          .select(col("id"), col("near_id"),
            round(graft.functions.DotProduct.dotProduct(col("vec"), col("__q"))
              / (sqrt(aggregate(transform(col("vec"), x => x * x),
                  lit(0.0), _ + _)) * col("__qn")), 6).as("cos_sim"))
          .filter(col("cos_sim") >= 0.999)
          .write.mode("overwrite").format("noop").save())
      val nocosT = timeIt(
        q.select(col("id"), col("cell_id"))
          .join(idx.select(col("near_id"), col("cell_id")), Seq("cell_id"))
          .filter(col("near_id") =!= col("id"))
          .write.mode("overwrite").format("noop").save())
      val f1 = full(); val f2 = full(); val f3 = full()
      sb.append(
        f"""${if (step > 0) "," else ""}{"batches":$batch,"index_rows":$rows,"full":[$f1%.2f,$f2%.2f,$f3%.2f],"nowin":$nowinT%.2f,"nocos":$nocosT%.2f}""")
    }
    println(s"""SEMGATE_BISECT {"sf":"$sfDir","steps":[${sb.toString}]}""")
    spark.stop()
  }
}
