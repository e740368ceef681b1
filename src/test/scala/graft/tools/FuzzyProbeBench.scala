package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition for the r17 PassJoin probe-side regression:
  * times the probe leg (explode + distinct) with and without the
  * present-length generator prune, and the lens collect itself.
  * Usage: Test/runMain graft.tools.FuzzyProbeBench
  */
object FuzzyProbeBench {
  private def segStart(i: org.apache.spark.sql.Column, l: org.apache.spark.sql.Column,
                       parts: Int) =
    floor(i * l / lit(parts.toDouble)).cast("long")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = 2
    val strs = graft.Tables.documents(spark, d)
      .select(col("doc_id").cast("long").as("id"),
        substring(col("text"), 1, 12).as("s"))
      .select(col("id"), col("s"), length(col("s")).cast("long").as("len"))

    def probe(pruned: Option[Seq[Long]]): DataFrame = {
      val outer = sequence(greatest(col("len") - k, lit(0L)), col("len") + k)
      val lts = pruned match {
        case Some(lens) => filter(outer, lt => array_contains(typedLit(lens), lt))
        case None => outer
      }
      val variants = flatten(transform(lts, lt =>
        flatten(transform(sequence(lit(0L), lit(k.toLong)), i =>
          transform(sequence(lit(-k.toLong), lit(k.toLong)), sh =>
            struct(lt.as("lt"), i.as("i"),
              (segStart(i, lt, k + 1) + sh).as("st"),
              (segStart(i + 1, lt, k + 1) - segStart(i, lt, k + 1)).as("ln")))))))
      strs
        .select(col("id").as("id_p"), col("s").as("s_p"), col("len"),
          explode(variants).as("v"))
        .filter(col("v.st") >= 0 && col("v.st") + col("v.ln") <= col("len"))
        .select(col("id_p"), col("s_p"), col("v.lt").as("lt"), col("v.i").as("i"),
          col("s_p").substr((col("v.st") + 1).cast("int"), col("v.ln").cast("int")).as("seg"))
        .distinct()
    }

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-28s median ${ts(2)}%.3f  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm
    noop(probe(None)); noop(probe(Some(Seq(12L))))
    time("lens collect")(
      strs.select(col("len")).distinct().collect())
    time("probe OLD (no prune)")(noop(probe(None)))
    time("probe NEW (prune lt=12)")(noop(probe(Some(Seq(12L)))))
    // explode only, no distinct
    def explodeOnly(pruned: Option[Seq[Long]]): DataFrame = {
      val outer = sequence(greatest(col("len") - k, lit(0L)), col("len") + k)
      val lts = pruned match {
        case Some(lens) => filter(outer, lt => array_contains(typedLit(lens), lt))
        case None => outer
      }
      val variants = flatten(transform(lts, lt =>
        flatten(transform(sequence(lit(0L), lit(k.toLong)), i =>
          transform(sequence(lit(-k.toLong), lit(k.toLong)), sh =>
            struct(lt.as("lt"), i.as("i"),
              (segStart(i, lt, k + 1) + sh).as("st"),
              (segStart(i + 1, lt, k + 1) - segStart(i, lt, k + 1)).as("ln")))))))
      strs.select(col("id").as("id_p"), col("s").as("s_p"), col("len"),
        explode(variants).as("v"))
    }
    time("explode OLD")(noop(explodeOnly(None)))
    time("explode NEW")(noop(explodeOnly(Some(Seq(12L)))))

    // the composed self-join, old/new probe, interleaved
    def indexSide: DataFrame =
      strs
        .select(col("id").as("id_x"), col("s").as("s_x"), col("len").as("lt"),
          explode(sequence(lit(0L), lit(k.toLong))).as("i"))
        .select(col("id_x"), col("s_x"), col("lt"), col("i"),
          col("s_x").substr(
            (segStart(col("i"), col("lt"), k + 1) + 1).cast("int"),
            (segStart(col("i") + 1, col("lt"), k + 1)
              - segStart(col("i"), col("lt"), k + 1)).cast("int"))
            .as("seg"))
    def selfJoin(pruned: Option[Seq[Long]]): DataFrame =
      probe(pruned).join(indexSide, Seq("lt", "i", "seg"))
        .filter(col("id_p") =!= col("id_x"))
        .filter(levenshtein(col("s_p"), col("s_x")) <= k)
        .select(least(col("id_p"), col("id_x")).as("id_a"),
          greatest(col("id_p"), col("id_x")).as("id_b"),
          levenshtein(col("s_p"), col("s_x")).cast("long").as("dist"))
        .distinct()
    noop(selfJoin(None)); noop(selfJoin(Some(Seq(12L))))
    time("selfJoin OLD")(noop(selfJoin(None)))
    time("selfJoin NEW")(noop(selfJoin(Some(Seq(12L)))))
    time("selfJoin NEW+collect") {
      val lens = strs.select(col("len")).distinct().collect()
        .map(_.getLong(0)).sorted.toSeq
      noop(selfJoin(Some(lens)))
    }
    // decompose the join phase
    def bareJoin(pruned: Option[Seq[Long]]): DataFrame =
      probe(pruned).join(indexSide, Seq("lt", "i", "seg"))
        .select(col("id_p"), col("id_x"))
    def levJoin(pruned: Option[Seq[Long]]): DataFrame =
      probe(pruned).join(indexSide, Seq("lt", "i", "seg"))
        .filter(col("id_p") =!= col("id_x"))
        .filter(levenshtein(col("s_p"), col("s_x")) <= k)
        .select(col("id_p"), col("id_x"))
    noop(bareJoin(None)); noop(bareJoin(Some(Seq(12L))))
    println("match counts: old=" + bareJoin(None).count() +
      " new=" + bareJoin(Some(Seq(12L))).count())
    time("levJoin OLD")(noop(levJoin(None)))
    time("levJoin NEW")(noop(levJoin(Some(Seq(12L)))))
    // identical output rows to NEW, but via the OLD generator + a plain
    // post-explode filter: separates "generator lambda" from "smaller
    // build relation"
    def levJoinPosthoc: DataFrame =
      probe(None).filter(col("lt") === 12L)
        .join(indexSide, Seq("lt", "i", "seg"))
        .filter(col("id_p") =!= col("id_x"))
        .filter(levenshtein(col("s_p"), col("s_x")) <= k)
        .select(col("id_p"), col("id_x"))
    noop(levJoinPosthoc)
    time("levJoin POSTHOC lt=12")(noop(levJoinPosthoc))
    // pre-materialized build side: kills build-lineage differences
    def levJoinCkpt(pruned: Option[Seq[Long]]): DataFrame =
      probe(pruned).localCheckpoint()
        .join(indexSide, Seq("lt", "i", "seg"))
        .filter(col("id_p") =!= col("id_x"))
        .filter(levenshtein(col("s_p"), col("s_x")) <= k)
        .select(col("id_p"), col("id_x"))
    noop(levJoinCkpt(None)); noop(levJoinCkpt(Some(Seq(12L))))
    time("levJoin CKPT OLD")(noop(levJoinCkpt(None)))
    time("levJoin CKPT NEW")(noop(levJoinCkpt(Some(Seq(12L)))))
    // pinned-parallelism variant: repartition the pruned probe on the
    // JOIN keys with the session's shuffle partitions (explicit N = not
    // AQE-coalescible)
    def levJoinPinned: DataFrame = {
      val p = spark.sessionState.conf.numShufflePartitions
      probe(Some(Seq(12L)))
        .repartition(p, col("lt"), col("i"), col("seg"))
        .join(indexSide, Seq("lt", "i", "seg"))
        .filter(col("id_p") =!= col("id_x"))
        .filter(levenshtein(col("s_p"), col("s_x")) <= k)
        .select(col("id_p"), col("id_x"))
    }
    noop(levJoinPinned)
    time("levJoin NEW pinned")(noop(levJoinPinned))

    // per-stage task counts + run times for one OLD and one NEW run
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.add(f"stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"runTimeMs=${si.taskMetrics.executorRunTime}%6d  ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for ((tag, p) <- Seq("OLD" -> None, "NEW" -> Some(Seq(12L)))) {
      stages.clear()
      noop(levJoin(p))
      Thread.sleep(1500) // let the listener bus drain
      println(s"==== stages $tag ====")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
