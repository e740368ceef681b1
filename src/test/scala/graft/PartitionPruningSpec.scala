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
}
