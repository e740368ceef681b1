package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.SyntheticDocs

/** The synthetic-docs DataSourceV2 connector: determinism, split
  * planning, filter pushdown narrowing the planned splits, column
  * pruning skipping text generation.
  */
class DataSourceV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def read(rows: Long, parts: Int) =
    spark.read.format("synthetic-docs")
      .option("numRows", rows).option("numPartitions", parts).load()

  test("reads are deterministic and row content matches the recipe") {
    val a = read(100, 4).collect().sortBy(_.getLong(0))
    val b = read(100, 7).collect().sortBy(_.getLong(0)) // parallelism-invariant
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
    val r17 = a(17)
    assert(r17.getString(1) == SyntheticDocs.lang(17))
    assert(r17.getString(3) == SyntheticDocs.text(17))
    assert(r17.getString(3).split(" ").length == SyntheticDocs.nTokens(17))
  }

  test("doc_id range pushdown narrows the planned splits (v2 partition pruning)") {
    val df = read(1000, 4).filter(col("doc_id") >= 900L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[900,1000)"), plan)
    assert(df.count() == 100)
    // contradictory range plans zero splits, returns empty without error
    assert(read(1000, 4).filter(col("doc_id") >= 500L && col("doc_id") < 100L).count() == 0)
  }

  test("unsupported filters are left to Spark and still applied") {
    val df = read(1000, 4).filter(col("doc_id") < 50L && col("lang") === "en")
    assert(df.queryExecution.executedPlan.toString.contains("range=[0,50)"))
    assert(df.count() == 10) // every 5th id in [0,50)
  }

  test("column pruning reaches the scan (text not materialized when unused)") {
    val df = read(1000, 4).select(col("doc_id"), col("lang"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[doc_id,lang]"), plan)
    assert(df.distinct().count() == 1000)
  }

  test("complete aggregate pushdown: count/min/max answered from the range, no Aggregate node") {
    val df = read(5000, 8).filter(col("doc_id") >= 1000L && col("doc_id") < 4000L)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PUSHED-AGG range=[1000,4000)"), plan)
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"), plan)
    assert(df.head() == org.apache.spark.sql.Row(3000L, 1000L, 3999L))
    // empty pushed range: count 0, min/max null (Spark empty-input semantics)
    val empty = read(5000, 8).filter(col("doc_id") >= 9999L)
      .agg(count(col("doc_id")).as("n"), min(col("doc_id")).as("mn"))
    assert(empty.queryExecution.executedPlan.toString.contains("PUSHED-AGG"), "count(col) must push too")
    assert(empty.head() == org.apache.spark.sql.Row(0L, null))
  }

  test("unsupported aggregates fall back to normal scan + Spark aggregation") {
    val df = read(1000, 4).agg(min(col("lang")).as("m"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PUSHED-AGG"), plan)
    assert(df.head() == org.apache.spark.sql.Row("de", 1000L))
    // grouped aggregation never pushes (complete form only)
    val grouped = read(1000, 4).groupBy(col("lang")).agg(max(col("doc_id")).as("m"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("PUSHED-AGG"))
    assert(grouped.count() == 5)
  }
}
