package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.JlProject

/** Johnson–Lindenstrauss hash-sign projection ([[graft.similarity.JlProject]]). */
class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("signs are ±1 and roughly balanced in every output dimension") {
    val s = JlProject.signs(8, 64)
    assert(s.length == 8 && s.forall(_.length == 64))
    s.zipWithIndex.foreach { case (row, c) =>
      assert(row.forall(v => v == 1L || v == -1L))
      val pos = row.count(_ == 1L)
      assert(pos >= 16 && pos <= 48, s"dim $c badly unbalanced: $pos/64 positive")
    }
    // rows differ (the matrix is not rank-1)
    assert(s.map(_.toSeq).distinct.length == 8)
  }

  test("projection is the exact integer sign-weighted sum") {
    // 4-dim vector, k=2: hand-fold against the signs matrix
    val s = JlProject.signs(2, 4)
    val x = Seq(0.5f, -0.25f, 0.125f, 1.0f)
    val xl = x.map(v => math.round(v.toDouble * 1e6))
    val expect = s.map(row => row.zip(xl).map { case (a, b) => a * b }.sum)
    val out = JlProject.projectFp(
        Seq((7L, x)).toDF("id", "emb"), "emb", "id", k = 2, dim = 4)
      .orderBy("c").collect()
    assert(out.map(_.getLong(2)).toSeq == expect.toSeq)
    assert(out.forall(_.getLong(0) == 7L))
  }

  test("norm is preserved on average over many vectors (JL property)") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)((rng.nextDouble() * 2 - 1).toFloat))
    }
    val out = JlProject.projectFp(rows.toDF("id", "emb"), "emb", "id", 8, 64)
      .select(col("id"), col("jl_ratio")).distinct().collect()
    assert(out.length == 200)
    val mean = out.map(_.getDouble(1)).sum / 200
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
  }

  test("projection plan is a zero-shuffle scan-stage map") {
    val df = Seq((1L, Seq.fill(64)(0.1f))).toDF("id", "emb")
    val plan = JlProject.projectFp(df, "emb", "id", 8, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
