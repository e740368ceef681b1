package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Ivf

/** Micro-attribution for the sf1 coded-cutover negative (the decade
  * ramp-reset run, BENCH_CODED_CUTOVER_SF1_r15): isolate the
  * CELLS-LINEAR per-batch term of [[Ivf.assignCell]] (append-side
  * argmin; interpreted `transform(aggregate(zip_with))`, cost
  * ~ rows x cells x dim) and [[Ivf.probeCells]] (probe-side nearest-
  * nProbe; the same distance loop PLUS a comparator `array_sort` over
  * the cell-index sequence, ~ rows x cells log cells interpreted
  * comparator calls) on ONE fixed batch at the stress's exact pre- and
  * post-cutover cell counts. If the composed series' boundary steps
  * (stats_ivf +4.9s, sem +12s at cells 40 -> 280) reproduce here on a
  * bare scan with nothing else in the plan, the attribution is the
  * assignment expressions, and the fill-term trade the cutover bought
  * is being repaid in interpreted centroid arithmetic.
  *
  * Usage: Test/runMain graft.tools.AssignCostProbe <scaledSfDir> [reps] [cells,…]
  * Prints one JSON line tagged ASSIGN_COST. The cell sweep defaults to
  * the stress's pre/post cutover counts (40, 280); the r16 policy refit
  * extends it to O(1000) counts — the regime a 100 TB IVF runs in.
  */
object AssignCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sfscale/sf1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cellSweep = if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
                    else Seq(40, 280)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)

    // one stress-shaped batch: the sf1 embeddings table as doubles,
    // checkpointed so every timed pass starts from the same in-memory
    // blocks (no parquet-read noise in the differential)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .localCheckpoint()
    val rows = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    // centroids: the k lowest-id vectors (trainCentroids' deterministic
    // init, minus the Lloyd's passes — geometry is irrelevant to the
    // per-row arithmetic being timed)
    def cents(k: Int): Seq[Ivf.Centroid] = emb.orderBy("vec_id").limit(k)
      .collect().zipWithIndex.map { case (r, i) =>
        Ivf.Centroid(i, r.getSeq[Double](1)) }.toSeq

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf(body: => Unit): Double = (0 until reps).map(_ => time(body)).min

    val out = cellSweep.map { k =>
      val cs = cents(k)
      // warm codegen/plan for this k before timing
      emb.withColumn("c", Ivf.assignCell(col("embedding"), cs))
        .write.mode("overwrite").format("noop").save()
      val assign = minOf {
        emb.withColumn("c", Ivf.assignCell(col("embedding"), cs))
          .write.mode("overwrite").format("noop").save()
      }
      val probe = minOf {
        emb.withColumn("c", Ivf.probeCells(col("embedding"), cs, nProbe = 1))
          .write.mode("overwrite").format("noop").save()
      }
      f"""{"cells":$k,"assign_sec":$assign%.3f,"probe_sec":$probe%.3f}"""
    }
    println(s"""ASSIGN_COST {"sf":"$sfDir","rows":$rows,"dim":$dim,""" +
      s""""reps":$reps,"series":[${out.mkString(",")}]}""")
    spark.stop()
  }
}
