package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for the incremental-dedup ingest path: prints
  * the batch-side prefix-token frequency profile at a given SF so the
  * hot-token cap / skip-bound behavior can be checked against real
  * data instead of guessed. Test-tree tool, never shipped.
  */
object IncDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = if (args.length > 1) args(1).toDouble else 0.6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (par <- Seq(0, 1)) {
      val half = docs.filter(pmod(col("doc_id"), lit(2)) === par)
      val rows = graft.dedup.IncrementalDedup.indexRows(
        half, "text", "doc_id", t)
      val bc = graft.dedup.IncrementalDedup.batchTokenCounts(rows)
      val stats = bc.agg(max(col("cnt")).as("mx"),
        count(lit(1)).as("distinct_toks"),
        sum(when(col("cnt") > graft.dedup.IncrementalDedup.DefaultHotTokenCap,
          1L).otherwise(0L)).as("hot_toks")).head()
      println(s"PROBE par=$par max=${stats.getLong(0)} " +
        s"distinct=${stats.getLong(1)} hot=${stats.getLong(2)} " +
        s"docs=${half.count()}")
    }

    // timed ingest, warm JVM: job-count + wall per phase, and per-job
    // wall + call site so the fixed-overhead jobs can be NAMED
    val nJobs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet()
          val site = j.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
            .mkString(" | ").take(160)
          jobStart.put(j.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(j.jobId)).foreach { case (t0, site) =>
            jobLog.add((j.jobId, (System.nanoTime() - t0) / 1e9, site))
          }
        }
      })
    for (warm <- 0 to 2) {
      val table = java.nio.file.Files.createTempDirectory("graft-probe")
        .toString + "/index"
      val j0 = nJobs.get(); val t0 = System.nanoTime()
      val r0 = graft.dedup.IncrementalDedup.processBatch(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", "doc_id",
        table, t, batchId = 0L)
      r0.write.mode("overwrite").format("noop").save()
      val t1 = System.nanoTime(); val j1 = nJobs.get()
      val r1 = graft.dedup.IncrementalDedup.processBatch(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), "text", "doc_id",
        table, t, batchId = 1L)
      r1.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime(); val j2 = nJobs.get()
      println(f"PROBE warm=$warm ingest0=${(t1 - t0) / 1e9}%.3f s " +
        f"jobs=${j1 - j0} ingest1=${(t2 - t1) / 1e9}%.3f s jobs=${j2 - j1}")
      if (warm == 2) {
        import scala.jdk.CollectionConverters._
        jobLog.asScala.toSeq.sortBy(_._1).foreach { case (id, sec, site) =>
          println(f"PROBE job=$id%4d ${sec}%7.3f s  $site")
        }
      }
      jobLog.clear()
    }
    spark.stop()
  }
}
