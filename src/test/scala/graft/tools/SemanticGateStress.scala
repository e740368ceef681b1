package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.{IncrementalIvf, Ivf}
import graft.sources.VersionedTable

/** Probe-cost-vs-index-growth stress for the SEMANTIC near-dup gate
  * ([[IncrementalIvf.nearDupPairs]]) — the measurement behind
  * SCALING.md's claim: at a FIXED cell count the gate's read grows with
  * per-cell fill (O(index/nCells) candidates per probe), while the
  * auto-retrain cadence (grow nCells to hold fill) keeps it flat.
  *
  * Two runs over identical batch series (sf0.1 embeddings replicated
  * with offset ids — every batch is the same 64-dim workload, so
  * accumulated index state is the only variable):
  *   - fixed: 2 cells forever — the adversarial baseline;
  *   - retrain: in-place retrain whenever mean fill exceeds `fill`,
  *     centroid eras resolved per probe exactly as the pipeline does.
  * Per batch we time nearDupPairs alone (noop-materialized) and then
  * append the batch. Retrain time is reported separately — it is the
  * amortized O(index) maintenance cost, not the per-probe cost under
  * test.
  *
  * Usage: Test/runMain graft.tools.SemanticGateStress <sfDir> <nBatches> <fill>
  * Prints one JSON line tagged SEMGATE_STRESS.
  */
object SemanticGateStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 12
    val fill = if (args.length > 2) args(2).toLong else 2000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val idSpan = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    def replica(i: Int) = emb
      .withColumn("vec_id", col("vec_id") + lit(i.toLong * idSpan))

    def run(auto: Boolean, batches: Int = nBatches): (Seq[Double], Seq[Double], Int) = {
      val t = java.nio.file.Files
        .createTempDirectory(s"graft-semgate-$auto").toString + "/index"
      val seed = Ivf.trainCentroids(replica(0), "embedding", "vec_id",
        nCells = 2, iters = 2)
      IncrementalIvf.seedCentroidsEra(spark, seed, t)
      val probeTimes = Seq.newBuilder[Double]
      val retrainTimes = Seq.newBuilder[Double]
      (0 until batches).foreach { i =>
        val cents = IncrementalIvf.activeCentroids(spark, t)
        val batch = replica(i).localCheckpoint()
        if (VersionedTable.latestVersion(t) >= 0) {
          val t0 = System.nanoTime()
          IncrementalIvf.nearDupPairs(spark, batch, "embedding", "vec_id",
              cents, t, threshold = 0.95, nProbe = 1)
            .write.mode("overwrite").format("noop").save()
          probeTimes += (System.nanoTime() - t0) / 1e9
        } else probeTimes += 0.0
        IncrementalIvf.addBatch(spark, batch, "embedding", "vec_id",
          cents, t, i.toLong)
        if (auto) {
          val rows = VersionedTable.read(spark, t).count()
          val cur = IncrementalIvf.activeCentroids(spark, t).size
          val need = if (rows == 0) 0L else (rows - 1) / fill + 1
          val want = math.min(4096L, math.max(cur.toLong, need)).toInt
          if (want > cur) {
            val t0 = System.nanoTime()
            IncrementalIvf.retrainInPlace(spark, t, nCells = want,
              iters = 2, sampleFraction = math.min(1.0,
                math.max(0.05, 200.0 * want / math.max(1L, rows))))
            retrainTimes += (System.nanoTime() - t0) / 1e9
          }
        }
      }
      (probeTimes.result(), retrainTimes.result(),
        IncrementalIvf.activeCentroids(spark, t).size)
    }

    // warm codegen on a short throwaway series so run 1 isn't janino
    run(auto = false, batches = 3)
    val (fixedProbe, _, fixedCells) = run(auto = false)
    val (autoProbe, autoRetrains, autoCells) = run(auto = true)

    def half(xs: Seq[Double]): (Double, Double) = {
      val live = xs.drop(1) // batch 0 probes an empty index
      val h = live.length / 2
      (live.take(h).sum / h, live.drop(h).sum / (live.length - h))
    }
    val (f1, f2) = half(fixedProbe)
    val (a1, a2) = half(autoProbe)
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(
      f"""SEMGATE_STRESS {"sf":"$sfDir","n_batches":$nBatches,"fill_target":$fill,"fixed":{"cells":$fixedCells,"probe_sec":${fmt(fixedProbe)},"mean_first_half":$f1%.3f,"mean_second_half":$f2%.3f,"ramp":${f2 / f1}%.3f},"auto":{"final_cells":$autoCells,"probe_sec":${fmt(autoProbe)},"mean_first_half":$a1%.3f,"mean_second_half":$a2%.3f,"ramp":${a2 / a1}%.3f,"retrain_sec":${fmt(autoRetrains)}}}""")
    spark.stop()
  }
}
