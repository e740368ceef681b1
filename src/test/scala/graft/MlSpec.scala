package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.LogReg

/** Fixed-point logistic-regression training ([[graft.ml.LogReg]]). */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Linearly separable 2-class data: class 1 iff x1 > 0. Values kept
    * off the 1e-6 grid boundaries so quantization is unambiguous. */
  private def separable(n: Int) = {
    val rows = (0 until n).map { i =>
      val x1 = if (i % 2 == 0) 0.4 + 0.001 * (i % 7) else -0.4 - 0.001 * (i % 7)
      val x2 = 0.1 * ((i % 5) - 2)
      val label = if (x1 > 0) 1 else 0
      (i.toLong, Seq(x1.toFloat, x2.toFloat), label)
    }
    rows.toDF("id", "emb", "label")
  }

  test("trainFp separates linearly separable data") {
    val df = separable(200)
    val w = LogReg.trainFp(df, "emb", "label", positive = 1, dim = 2,
      iters = 20, lr = 0.5)
    assert(w.length == 3)
    // the x1 weight must dominate and be positive; all 200 rows classified
    assert(w(1) > 0)
    val scored = LogReg.scoreFp(df, "emb", "id", w)
      .join(df.select(col("id"), col("label").cast("long").as("y")), "id")
    val acc = scored.filter(col("pred") === col("y")).count() / 200.0
    assert(acc >= 0.99, s"accuracy $acc")
  }

  test("trainFp is bit-identical across partitionings (order-free exact sums)") {
    val df = separable(151)
    val w3 = LogReg.trainFp(df.repartition(3), "emb", "label", 1, 2, 6, 0.5)
    val w17 = LogReg.trainFp(df.repartition(17), "emb", "label", 1, 2, 6, 0.5)
    assert(w3.toSeq == w17.toSeq)
  }

  test("trainFp: iteration 1 from zero weights moves the bias by the class imbalance") {
    // with w=0 every p is exactly 0.5, so the bias gradient is
    // sum(0.5 - y): n/2 - positives — a hand-computable first step
    val df = Seq(
      (0L, Seq(0.25f, 0.0f), 1), (1L, Seq(-0.25f, 0.0f), 0),
      (2L, Seq(0.125f, 0.0f), 0), (3L, Seq(-0.125f, 0.0f), 0)
    ).toDF("id", "emb", "label")
    val w = LogReg.trainFp(df, "emb", "label", positive = 1, dim = 2,
      iters = 1, lr = 0.5)
    // bias grad = (0.5-1) + 0.5 + 0.5 + 0.5 = 1.0 → mean 0.25, step -0.125
    assert(w(0) == -125000L)
    // x1 grad = (-.5)(.25) + (.5)(-.25) + (.5)(.125) + (.5)(-.125)
    //         = -0.25 → mean -0.0625, step +0.03125
    assert(w(1) == 31250L)
    assert(w(2) == 0L)
  }

  test("trainFp rejects empty input, bad iters, and oversized features") {
    val empty = Seq.empty[(Long, Seq[Float], Int)].toDF("id", "emb", "label")
    intercept[IllegalArgumentException](
      LogReg.trainFp(empty, "emb", "label", 1, 2, 1, 0.5))
    val one = Seq((0L, Seq(0.1f, 0.1f), 1)).toDF("id", "emb", "label")
    intercept[IllegalArgumentException](
      LogReg.trainFp(one, "emb", "label", 1, 2, 0, 0.5))
    val big = Seq((0L, Seq(500.0f, 0.1f), 1)).toDF("id", "emb", "label")
    intercept[IllegalArgumentException](
      LogReg.trainFp(big, "emb", "label", 1, 2, 1, 0.5))
  }

  test("naiveBayes: hand-checked counts, smoothing, and priors on a tiny corpus") {
    import graft.ml.NaiveBayes
    val docs = Seq(
      (0L, "a a b", "x"), (1L, "a b", "x"), (2L, "c c", "y")
    ).toDF("doc_id", "text", "lang")
    val (priors, lik) = NaiveBayes.model(docs, "text", "lang")
    val pr = priors.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // priors: x = ln(2/3), y = ln(1/3), snapped to 1e-6
    assert(math.abs(pr("x") - math.log(2.0 / 3.0)) < 1e-6)
    assert(math.abs(pr("y") - math.log(1.0 / 3.0)) < 1e-6)
    val ll = lik.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(ll.size == 6) // dense: 3 vocab terms x 2 classes
    // class x: 5 tokens, V=3 -> denominator 8; 'a' seen 3x
    assert(ll(("x", "a"))._1 == 3L)
    assert(math.abs(ll(("x", "a"))._2 - math.log(4.0 / 8.0)) < 1e-6)
    // unseen (y, a): cnt 0, add-one floor over denominator 2+3
    assert(ll(("y", "a"))._1 == 0L)
    assert(math.abs(ll(("y", "a"))._2 - math.log(1.0 / 5.0)) < 1e-6)
  }

  test("naiveBayes: separable vocabularies classify the training corpus perfectly") {
    import graft.ml.NaiveBayes
    val docs = (0 until 60).map { i =>
      val cls = Seq("en", "fr", "de")(i % 3)
      val words = cls match {
        case "en" => "the cat sat here"
        case "fr" => "le chat assis ici"
        case _    => "die katze sass hier"
      }
      (i.toLong, words, cls)
    }.toDF("doc_id", "text", "lang")
    val (priors, lik) = NaiveBayes.model(docs, "text", "lang")
    val scored = NaiveBayes.score(docs, "doc_id", "text", priors, lik)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    assert(scored.filter(col("pred") === col("lang")).count() == 60)
    // exactly one prediction per doc
    assert(scored.count() == 60)
  }

  test("naiveBayes: exact score tie breaks to the lexicographically first class") {
    import graft.ml.NaiveBayes
    // perfectly symmetric classes: every doc's score ties across x and y
    val docs = Seq((0L, "a", "x"), (1L, "a", "y")).toDF("doc_id", "text", "lang")
    val (priors, lik) = NaiveBayes.model(docs, "text", "lang")
    val preds = NaiveBayes.score(docs, "doc_id", "text", priors, lik)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(0L) == "x" && preds(1L) == "x")
  }

  test("scoreFp margin sign matches p >= 0.5 and ships the model as a literal") {
    val df = separable(60)
    val w = LogReg.trainFp(df, "emb", "label", 1, 2, 10, 0.5)
    val out = LogReg.scoreFp(df, "emb", "id", w)
    assert(out.columns.toSeq == Seq("id", "score_fp", "pred"))
    out.collect().foreach { r =>
      assert((r.getLong(1) >= 0) == (r.getLong(2) == 1L))
    }
    // zero shuffles: the scoring plan has no Exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
