package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-partitioned layout + partition pruning: a filter on the partition
  * column must prune directories at planning time (PartitionFilters, not
  * data filters) — at 100 TB this is the difference between reading one
  * day and reading three years.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("filter on partition column prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", expr("CAST(timestamp_micros(ts div 1000) AS DATE)"))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val oneDay = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-02")
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"), scan)

    // pruning actually works: the one-day read touches exactly the rows
    // of that partition
    val expected = ev.filter(col("event_date") === "2024-01-02").count()
    assert(expected > 0 && oneDay.count() == expected)

    val days = new java.io.File(dir).listFiles().count(_.getName.startsWith("event_date="))
    assert(days > 1, s"expected multiple partitions, got $days")
  }

  test("LSH layout: driver-enumerated probe buckets prune a bucket-partitioned corpus") {
    import graft.similarity.Similarity
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planes = 6 // 64 possible buckets -> several real partitions at sf0.001
    val dir = Files.createTempDirectory("graft-lsh").toString
    emb.withColumn("bucket",
        Similarity.lshBucket(Similarity.toDouble(col("embedding")), planes))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)

    val qEmb = emb.filter(col("vec_id") === 0)
      .select(Similarity.toDouble(col("embedding"))).head().getSeq[Double](0).toArray
    val probes = Similarity.probeBuckets(Similarity.bucketOf(qEmb, planes), planes, 1)
    assert(probes.size == 7) // C(6,0) + C(6,1)

    val pruned = spark.read.parquet(dir).filter(col("bucket").isin(probes: _*))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    // the isin lands in PartitionFilters — directory pruning at planning
    // time; a bit_count(xor) hamming predicate can never do this
    assert(scan.contains("PartitionFilters: [bucket"), scan)
    assert(scan.contains(" IN ("), scan)

    // pruned read returns exactly the hamming-ball members
    val qb = Similarity.bucketOf(qEmb, planes)
    val expected = spark.read.parquet(dir)
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qb))) <= 1).count()
    assert(pruned.count() == expected && expected > 0)

    val parts = new java.io.File(dir).listFiles().count(_.getName.startsWith("bucket="))
    assert(parts > probes.size, s"expected more partitions than probes, got $parts")
  }
}
