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
}
