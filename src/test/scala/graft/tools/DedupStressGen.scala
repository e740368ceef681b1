package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesizes an ~sf1 stress corpus for the dedup candidate-generator
  * family: `reps` replicas of sf0.1's documents, each replica's tokens
  * suffixed with the replica id so NO shingle crosses replicas — the
  * corpus grows reps×, the near-dup DENSITY stays exactly sf0.1's, and
  * the candidate-pair count should therefore grow ~linearly. (Naive
  * replication without the suffix would make every doc a 10-way exact
  * dup and quadratically inflate pairs — a different, unrepresentative
  * stress.) doc_ids are remapped to stay unique.
  *
  * Usage: Test/runMain graft.tools.DedupStressGen <srcSfDir> <outDir> <reps>
  * Then:  SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_BENCH_ONLY=... Bench
  */
object DedupStressGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, repsStr) = args
    val reps = repsStr.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val idSpan = docs.agg(max("doc_id")).head.getLong(0) + 1
    val replicas = (0 until reps).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * idSpan))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            t => concat(t, lit(s"~$i"))), " "))
        .withColumn("n_chars", length(col("text")))
    }
    replicas.reduce(_.unionByName(_))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"STRESS_GEN rows=${spark.read.parquet(s"$out/documents.parquet").count()}")
    spark.stop()
  }
}
