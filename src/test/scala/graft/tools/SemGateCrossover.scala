package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.{IncrementalIvf, Ivf, Pq}
import graft.sources.VersionedTable

/** Measure the coded semantic gate's WIN REGIME against the float gate
  * (VERDICT r14 missing #2): the composition's reason to exist is the
  * scan-bound regime — at 100 TB the index's raw embeddings ARE the
  * gate's read cost, and the coded coarse phase reads an m-byte codes
  * column instead. sf0.1's 64-dim floats fit in page cache, so the r13/
  * r14 stress series measured the coded gate LOSING locally (~6 s vs
  * ~2.5 s sem stage); this harness builds the IO-bound configuration
  * locally — 512-dim embeddings (cosine-preserving scaled tiling of the
  * real 64-dim table), a corpus-scale index, and a COLD page cache
  * (`/proc/sys/vm/drop_caches`, available in this container) — and
  * measures both faces' wall time AND task-level input bytes.
  *
  * Probe sizing keeps the coded re-rank on its In-pushdown path
  * (probeDocs × adcCandidates ≤ MaxPayloadIdCollect), the production
  * shape for a micro-batch gate; the measured differential is then the
  * claim itself: coarse codes read vs full float read of the probed
  * cells.
  *
  * Usage: Test/runMain graft.tools.SemGateCrossover <sfDir> <tile> <nBatches> <probeDocs>
  * Prints one JSON line tagged SEMGATE_CROSSOVER.
  */
object SemGateCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tile = if (args.length > 1) args(1).toInt else 8
    val nBatches = if (args.length > 2) args(2).toInt else 64
    val probeDocs = if (args.length > 3) args(3).toInt else 100
    val adcCand = 8
    require(probeDocs * adcCand <= graft.dedup.IncrementalDedup.MaxPayloadIdCollect,
      "probe sizing must keep the re-rank on the In-pushdown path")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    // process-level IO counters: Spark's inputMetrics.bytesRead does
    // NOT track the local vectorized parquet path (measured: a 214 MB
    // column scan reports 5 MB — footers only), so the differential
    // comes from /proc/self/io instead. local[*] is one process, so
    // rchar = logical bytes read (parquet pages whether cached or not,
    // plus shuffle files) and read_bytes = actual storage IO (the cold
    // number after drop_caches).
    def ioBytes(): (Long, Long) = {
      val m = scala.io.Source.fromFile("/proc/self/io").getLines()
        .map(_.split(":\\s*")).map(a => a(0) -> a(1).trim.toLong).toMap
      (m("rchar"), m("read_bytes"))
    }

    // cosine-preserving widening: concatenating per-copy SCALED copies
    // multiplies both the dot product and the norms by the same factor,
    // so every pairwise cosine (and thus every gate verdict) is
    // IDENTICAL to the 64-dim original — only the bytes change
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        flatten(transform(sequence(lit(0), lit(tile - 1)),
          j => transform(col("embedding"),
            x => x.cast("double") * (lit(1.0) + j.cast("double") * 0.1))))
          .as("embedding"))
      .localCheckpoint()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val idSpan = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    def replica(i: Int) = emb
      .withColumn("vec_id", col("vec_id") + lit(i.toLong * idSpan))
    val cents = Ivf.trainCentroids(emb, "embedding", "vec_id",
      nCells = 2, iters = 2)
    val m = 64
    val cb = Pq.train(emb, "embedding", "vec_id", m = m, k = 16)
    val t = java.nio.file.Files.createTempDirectory("graft-semxover")
      .toString + "/index"
    (0 until nBatches).foreach { b =>
      IncrementalIvf.addBatch(spark, replica(b), "embedding", "vec_id",
        cents, t, b.toLong, codebook = Some(cb))
    }
    val idxRows = VersionedTable.read(spark, t).count()
    val probe = replica(nBatches).limit(probeDocs).localCheckpoint()

    def dropCaches(): Boolean = try {
      new ProcessBuilder("sync").start().waitFor()
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/proc/sys/vm/drop_caches"),
        "3".getBytes("UTF-8"))
      true
    } catch { case _: Throwable => false }

    def gate(coded: Boolean): Unit = (
      if (coded)
        IncrementalIvf.nearDupPairsAdc(spark, probe, "embedding", "vec_id",
          cents, t, threshold = 0.999, cb, adcCandidates = adcCand,
          nProbe = 1)
      else
        IncrementalIvf.nearDupPairs(spark, probe, "embedding", "vec_id",
          cents, t, threshold = 0.999, nProbe = 1)
      ).write.mode("overwrite").format("noop").save()

    final case class Run(sec: Double, rchar: Long, disk: Long)
    def measure(f: => Unit, cold: Boolean): Run = {
      if (cold) require(dropCaches(), "drop_caches unavailable")
      val (r0, d0) = ioBytes()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      val (r1, d1) = ioBytes()
      Run(sec, r1 - r0, d1 - d0)
    }
    // the index-side LEG each face scans — the differential the 100 TB
    // claim is about, isolated from join/window overhead: the float
    // candidate leg reads (id, cell_id, vec) of the probed cells, the
    // coded coarse leg (id, cell_id, codes)
    val snapLatest = VersionedTable.read(spark, t)
    val probedCells = probe
      .select(Ivf.probeCells(
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")), cents, 1).as("cs"))
      .select(explode(col("cs"))).distinct().collect().map(_.getInt(0)).toSeq
    def legScan(coded: Boolean): Unit = snapLatest
      .select(col("id"), col("cell_id"),
        if (coded) col("codes") else col("vec"))
      .filter(col("cell_id").isin(probedCells: _*))
      .write.mode("overwrite").format("noop").save()
    // results parity first (the measurement must be of the SAME gate):
    // with every index vector an exact cosine-copy family, top-1 ids can
    // legitimately differ, so compare the flagged-probe sets and sims
    def verdicts(coded: Boolean) = (
      if (coded)
        IncrementalIvf.nearDupPairsAdc(spark, probe, "embedding", "vec_id",
          cents, t, threshold = 0.999, cb, adcCandidates = adcCand, nProbe = 1)
      else
        IncrementalIvf.nearDupPairs(spark, probe, "embedding", "vec_id",
          cents, t, threshold = 0.999, nProbe = 1)
      ).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val vF = verdicts(coded = false); val vC = verdicts(coded = true)
    require(vF.keySet == vC.keySet && vF.forall { case (k, s) =>
      math.abs(vC(k) - s) < 1e-6 },
      s"faces diverged: float=${vF.size} coded=${vC.size} flags")

    // warm-up everything (janino), then 3 warm + 3 cold reps per face
    // and per isolated leg
    gate(coded = false); gate(coded = true)
    legScan(coded = false); legScan(coded = true)
    def series(f: => Unit, cold: Boolean) =
      (0 until 3).map(_ => measure(f, cold))
    val fw = series(gate(coded = false), cold = false)
    val cw = series(gate(coded = true), cold = false)
    val fc = series(gate(coded = false), cold = true)
    val cc = series(gate(coded = true), cold = true)
    val lfw = series(legScan(coded = false), cold = false)
    val lcw = series(legScan(coded = true), cold = false)
    val lfc = series(legScan(coded = false), cold = true)
    val lcc = series(legScan(coded = true), cold = true)
    def fmt(rs: Seq[Run]) =
      s"""{"sec":[${rs.map(r => f"${r.sec}%.2f").mkString(",")}],""" +
        s""""mb_logical":[${rs.map(r => f"${r.rchar / 1048576.0}%.1f").mkString(",")}],""" +
        s""""mb_disk":[${rs.map(r => f"${r.disk / 1048576.0}%.1f").mkString(",")}]}"""
    println(
      s"""SEMGATE_CROSSOVER {"sf":"$sfDir","dim":$dim,"tile":$tile,""" +
      s""""index_rows":$idxRows,"probe_docs":$probeDocs,"m":$m,"adc_candidates":$adcCand,""" +
      s""""probed_cells":${probedCells.size},"flagged_probes":${vF.size},""" +
      s""""float_gate_warm":${fmt(fw)},"coded_gate_warm":${fmt(cw)},""" +
      s""""float_gate_cold":${fmt(fc)},"coded_gate_cold":${fmt(cc)},""" +
      s""""float_leg_warm":${fmt(lfw)},"coded_leg_warm":${fmt(lcw)},""" +
      s""""float_leg_cold":${fmt(lfc)},"coded_leg_cold":${fmt(lcc)}}""")
    spark.stop()
  }
}
