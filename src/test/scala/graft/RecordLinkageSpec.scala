package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.FieldSpec

class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fields = Seq(
    FieldSpec("name", (a, b) => a === b, m = 0.9, u = 0.1),
    FieldSpec("city", (a, b) => a === b, m = 0.8, u = 0.2))

  test("weights match the closed-form log2 likelihood ratios") {
    val f = fields.head
    assert(math.abs(f.wAgree - math.log(9.0) / math.log(2.0)) < 1e-12)
    assert(math.abs(f.wDisagree - math.log(0.1 / 0.9) / math.log(2.0)) < 1e-12)
  }

  test("score classifies a hand case: full agree=match, none=nonmatch") {
    val a = Seq((1L, "blk", "ann", "rome"), (2L, "blk", "bob", "kyiv"))
      .toDF("id", "blk", "name", "city")
    val b = Seq((10L, "blk", "ann", "rome"), (20L, "blk", "zoe", "oslo"))
      .toDF("id", "blk", "name", "city")
    val out = RecordLinkage.score(a, b, "id", Seq("blk"), fields,
      upper = 4.0, lower = 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(5))).toMap
    // full agreement: log2(9) + log2(4) = 3.1699 + 2 = 5.1699 >= 4
    assert(out((1L, 10L)) == "match")
    // no agreement: log2(1/9) + log2(1/4) = -5.1699 < 0
    assert(out((1L, 20L)) == "nonmatch")
    assert(out((2L, 10L)) == "nonmatch")
    val w = RecordLinkage.score(a, b, "id", Seq("blk"), fields, 4.0, 0.0)
      .filter(col("id_a") === 1 && col("id_b") === 10)
      .select("weight").head().getDouble(0)
    assert(math.abs(w - (math.log(9.0) + math.log(4.0)) / math.log(2.0)) < 1e-6)
  }

  test("blocking restricts candidates to equal block keys") {
    val a = Seq((1L, "x", "n", "c"), (2L, "y", "n", "c")).toDF("id", "blk", "name", "city")
    val b = Seq((3L, "x", "n", "c"), (4L, "z", "n", "c")).toDF("id", "blk", "name", "city")
    val pairs = RecordLinkage.score(a, b, "id", Seq("blk"), fields, 4.0, 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L)))
  }

  test("selfJoin emits each unordered pair once (id_a < id_b)") {
    val t = Seq((1L, "x", "n", "c"), (2L, "x", "n", "c"), (3L, "x", "n", "d"))
      .toDF("id", "blk", "name", "city")
    val pairs = RecordLinkage.score(t, t, "id", Seq("blk"), fields, 4.0, 0.0,
      selfJoin = true).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("patternCounts partitions all pairs across the 2^k patterns") {
    val t = Seq((1L, "x", "n", "c"), (2L, "x", "n", "c"), (3L, "x", "m", "d"))
      .toDF("id", "blk", "name", "city")
    val scored = RecordLinkage.score(t, t, "id", Seq("blk"), fields, 4.0, 0.0,
      selfJoin = true)
    val pats = RecordLinkage.patternCounts(scored, fields).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pats == Map((1L, 1L) -> 1L, (0L, 0L) -> 2L))
  }

  test("score requires sane probabilities") {
    intercept[IllegalArgumentException] {
      FieldSpec("bad", (a, b) => a === b, m = 0.2, u = 0.5)
    }
  }
}
