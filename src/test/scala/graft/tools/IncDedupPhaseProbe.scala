package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.dedup.IncrementalDedup
import graft.sources.VersionedTable

/** Phase-level decomposition of one incremental-dedup ingest against a
  * pre-grown index: builds a K-batch index (token-suffixed replicas, so
  * no cross-batch matches), then times each phase of one more ingest —
  * signature checkpoint, batch counts + tf commit, pair pass, index
  * commit, result evaluation. Pinpoints which term grows with K.
  *
  * Usage: Test/runMain graft.tools.IncDedupPhaseProbe <sfDir> <k> <threshold>
  */
object IncDedupPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 19
    val t = if (args.length > 2) args(2).toDouble else 0.6
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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

    val table = java.nio.file.Files
      .createTempDirectory("graft-phase-probe").toString + "/index"
    for (i <- 0 until k)
      IncrementalDedup.processBatch(spark, replica(i), "text", "doc_id",
        table, t, i.toLong).write.format("noop").mode("overwrite").save()

    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    for (rep <- 0 until 2) {
      println(s"PHASE --- probe ingest rep=$rep (index batches=$k) ---")
      val batch = replica(k + 1 + rep)
      val rows = tm("indexRows+ckpt") {
        IncrementalDedup.indexRows(batch, "text", "doc_id", t).localCheckpoint()
      }
      val bc = IncrementalDedup.batchTokenCounts(rows)
      val nRows = tm("rows.count")(rows.count())
      val tf = IncrementalDedup.tokenFreqTable(table)
      val hint = IncrementalDedup.readMaxCntHint(tf)
      val batchMax = tm("tf-commit+observe") {
        val obs = org.apache.spark.sql.Observation()
        VersionedTable.commit(
          bc.observe(obs, coalesce(max(col("cnt")), lit(0L)).as("mx"))
            .withColumn("batch", lit(999L)),
          tf, "append", None, None, expectedVersion = None)
        obs.getAsJava.get("mx").asInstanceOf[Long]
      }
      println(s"PHASE hint=$hint batchMax=$batchMax " +
        s"cold=${hint.exists(_ + batchMax <= IncrementalDedup.DefaultHotTokenCap)}")
      val ver = VersionedTable.latestVersion(table)
      val index = tm("index-frame-build") {
        Some(VersionedTable.readVersion(spark, table, ver)
          .select(col("id"), col("sz"), col("sh"), col("shh"), col("prefix")))
      }
      val pairs = tm("batchPairs+ckpt") {
        IncrementalDedup.batchPairs(rows, index, t,
          IncrementalDedup.DefaultHotTokenCap, IncrementalDedup.DefaultHotChunk,
          IncrementalDedup.DefaultMaxHotCollect, None,
          IncrementalDedup.HotInputs(batchFreq = Some(bc),
            batchMaxFreq = Some(batchMax),
            indexMaxCnt = hint)).localCheckpoint()
      }
      val within = pairs.filter(col("within"))
        .select(col("id_new").as("id_a"), col("id_old").as("id_b"))
      tm("within-collect")(within.limit(1 << 20).collect())
      tm("index-commit") {
        VersionedTable.commit(
          rows.coalesce(math.max(1L, nRows / 200000L).toInt)
            .withColumn("batch", lit(999L + rep)),
          table, "append", None, None, expectedVersion = None)
      }
    }
    spark.stop()
  }
}
