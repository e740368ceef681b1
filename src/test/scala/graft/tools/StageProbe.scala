package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level decomposition of a declared query: run it (noop sink,
  * reps warm + 1 instrumented) and print per-stage task counts and
  * executor run times — the Spark-UI stage table for a UI-less box.
  * Usage: Test/runMain graft.tools.StageProbe <q1,q2,...> [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProbe <q1,q2,...> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"run=${m.executorRunTime}%6dms gc=${m.jvmGCTime}%5dms " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
          si.name.take(70) +
          (if (m.executorRunTime > 500)
            "\n    rdds: " + si.rddInfos.map(_.name).mkString(" <- ").take(200)
          else ""))
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.sources.CheckpointScope.withScope(spark.sparkContext) {
          fn(spark, sf).write.mode("overwrite").format("noop").save()
        }
        (System.nanoTime() - t0) / 1e9
      }
      run(); run() // warm
      stages.clear()
      val t = run()
      Thread.sleep(1200)
      println(f"==== $name wall ${t}%.3f s ====")
      stages.forEach(s => println(s))
      if (sys.env.contains("STAGE_PROBE_PLAN")) {
        // execute via collect so THIS QueryExecution carries runtime
        // metrics, then print every node with its hot metrics
        val df = graft.sources.CheckpointScope.withScope(spark.sparkContext) {
          val d = fn(spark, sf); d.collect(); d
        }
        def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
          val interesting = p.metrics.filter { case (k, m) =>
            (k.contains("time") || k.contains("Time") || k == "numOutputRows") &&
              m.value > 0 }
            .map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
          println(("  " * depth) + p.nodeName + "  " + interesting)
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              Seq(q.plan)
            case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
            case other => other.children
          }
          kids.foreach(walk(_, depth + 1))
        }
        walk(df.queryExecution.executedPlan, 0)
      }
    }
    spark.stop()
  }
}
