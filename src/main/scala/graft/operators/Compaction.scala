package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the housekeeping operator every long-lived
  * 100 TB lake needs: streaming sinks and fine-grained partition
  * overwrites accrete many tiny parquet files, and scan throughput dies
  * on per-file open cost long before data volume is the problem.
  */
object Compaction {

  /** Rewrite `srcDir`'s parquet files as ~`targetRowsPerFile`-row files
    * in `dstDir`; returns the file count written. The count()+ceil sizing
    * makes the output deterministic; `repartition(n)` is a round-robin
    * shuffle (no skew by construction, no sort) — chain
    * `sortWithinPartitions` upstream when min/max file-skipping stats on
    * a sort key matter more than pure evenness. Writes to a NEW
    * directory: compact-then-swap keeps readers consistent (overwriting
    * a directory while reading it is undefined).
    */
  def compactParquet(spark: SparkSession, srcDir: String, dstDir: String,
                     targetRowsPerFile: Long): Int = {
    require(srcDir != dstDir, "compact into a new directory, then swap")
    val df = spark.read.parquet(srcDir)
    val parts = math.max(1L, math.ceil(df.count().toDouble / targetRowsPerFile).toLong).toInt
    df.repartition(parts).write.mode("overwrite").parquet(dstDir)
    parts
  }
}
