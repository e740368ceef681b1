package graft.tools

import org.apache.spark.sql.SparkSession

/** The measured decade (VERDICT r14 #5): time the headline incremental
  * queries at sf0.1 AND at the 10× scaled dir ([[GenScaledSf]] output)
  * and report the per-query ratio.
  *
  * Measurement design: this box's background load drifts on a
  * tens-of-minutes horizon (the r13/r14 bench adjudications measured
  * 3–10× swings on identical plans), so two SEPARATE full passes — one
  * per scale — put different machine states under the two numerators
  * and the ratio measures the drift, not the scaling. Here each rep
  * times a query at BOTH scales back-to-back in one JVM (adjacent
  * seconds share machine state, so drift cancels in the ratio to first
  * order) and the reported number is the per-scale MIN across reps —
  * the estimator least coupled to load spikes. Timing conventions are
  * Bench's: noop sink (full plan, no collect), CheckpointScope per run,
  * sf0.001 warm-up so janino never lands in a timed rep.
  *
  * Usage: Test/runMain graft.tools.ScalingDecade <sfSmall> <sfBig> [reps] [names,…]
  */
object ScalingDecade {
  private val Headline = Seq(
    "q_dedup_incremental", "q_dedup_minhash_incremental",
    "q_index_lookup", "q_minhash_lookup",
    "q_semantic_lookup", "q_semantic_lookup_adc",
    "q_ann_ivf_incremental", "q_ann_ivfpq_incremental",
    "q_ingest_pipeline", "q_ingest_pipeline_minhash",
    "q_ingest_pipeline_semantic", "q_ingest_pipeline_semantic_adc")

  def main(args: Array[String]): Unit = {
    val sfSmall = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sfBig = if (args.length > 1) args(1) else "target/sfscale/sf1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val names =
      if (args.length > 3) args(3).split(",").toSeq else Headline
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    graft.Certificates.enforce = false

    // a failed rep returns +Inf so min() can never adopt the (likely
    // fast) elapsed time of a broken attempt, and the failure is
    // COUNTED into the artifact — a committed ratio built on failed
    // reps must say so in the JSON, not only on a scrolled-away stderr
    // (ADVICE r15)
    def once(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        graft.sources.CheckpointScope.withScope(spark.sparkContext) {
          graft.SparkEntry.queries(name)(spark, dir)
            .write.mode("overwrite").format("noop").save()
        }
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[decade] $name@$dir failed: ${e.getMessage}")
        Double.PositiveInfinity
      }
    }
    names.foreach(once(_, "/root/testdata/sf0.001")) // janino warm-up

    val rows = names.map { name =>
      val small = Array.fill(reps)(0.0); val big = Array.fill(reps)(0.0)
      (0 until reps).foreach { r =>
        small(r) = once(name, sfSmall)
        big(r) = once(name, sfBig)
        System.err.println(f"[decade] $name rep$r: ${small(r)}%.2f -> ${big(r)}%.2f")
      }
      (name, small.min, big.min,
        small.count(_.isInfinite) + big.count(_.isInfinite))
    }
    val body = rows.map { case (n, s, b, failed) =>
      // all-reps-failed leaves min = Inf: emit null, not a bogus number
      def num(x: Double) = if (x.isInfinite) "null" else f"$x%.3f"
      val ratio = if (s.isInfinite || b.isInfinite) "null" else f"${b / s}%.2f"
      s""""$n":{"small_sec":${num(s)},"big_sec":${num(b)},""" +
        s""""ratio":$ratio,"failed_reps":$failed}"""
    }.mkString(",")
    println(s"""SCALING_DECADE {"small":"$sfSmall","big":"$sfBig","reps":$reps,"estimator":"per-scale min of interleaved reps; failed reps excluded and counted","queries":{$body}}""")
    spark.stop()
  }
}
