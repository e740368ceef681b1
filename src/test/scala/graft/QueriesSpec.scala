package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every SparkEntry query runs at sf0.001 and returns rows; every
  * oracle key refers to an existing query. The value-level check is the
  * driver's DuckDB differential gate (tools/compare.py locally).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("approx_count_distinct error is comfortably inside the oracled 10% bound") {
    import org.apache.spark.sql.functions._
    val rows = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      val err = math.abs(a - e).toDouble / e
      assert(err <= 0.05, s"flag ${r.getString(0)}: approx $a vs exact $e (err $err)")
    }
  }

  // Harness output contract: the driver's comparator (tools/compare.py)
  // normalizes results with a pandas sort over every column, which throws
  // on non-scalar cells (ndarray is unhashable/unorderable). Any query
  // emitting a top-level array/map/struct column would therefore be red
  // at the CORRECTNESS gate regardless of value correctness — serialize
  // via array_join / to_json instead (the q_pq_encode lesson, round 6).
  test("no query emits a top-level array/map/struct column (harness contract)") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    Certificates.enforce = false
    try {
      val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          fn(spark, sf).schema.fields.collect {
            case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
              s"$name.${f.name}: ${f.dataType.simpleString}"
          }
      }
      assert(violations.isEmpty,
        s"non-scalar output columns break the oracle comparator:\n  " +
          violations.mkString("\n  "))
    } finally Certificates.enforce = true
  }

  // Smoke runs uncertified: precondition certificates are calibrated for
  // the ORACLE regime (sf0.01) and legitimately fire at sf0.001 (e.g. the
  // simhash recall margin — the tiny corpus's verified pairs reach
  // hamming 7). Certificate firing behavior is itself spec-pinned in
  // DedupSimilaritySpec.
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with rows > 0") {
      Certificates.enforce = false
      try assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
      finally Certificates.enforce = true
    }
  }
}
