package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubBuckets
import graft.similarity.Similarity

/** Pins the oversized-bucket split semantics: capped sub-bucket sizes,
  * the rank-distance recall floor, exactly-once pair emission, and the
  * healthy-bucket identity — plus the drop-set-sized semDedup bloom.
  */
class SubBucketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cap = 64
  private val n = 150 // one bucket, 2.3x oversized

  // deterministic dim-8 vectors; ids are 0..n-1 so rank == id
  private lazy val skewed = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian()), 1))
      .toDF("vec_id", "embedding", "label")
  }

  test("withMembership bounds every (bucket, pass, sub) group at cap") {
    val m = SubBuckets.withMembership(
      skewed.select(col("label").as("__bk"), col("vec_id").as("id")),
      Seq(col("__bk")), col("id"), cap)
    val sizes = m.groupBy("__bk", "__pass", "__sub").count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(3) <= cap))
    // oversized bucket: every row appears in exactly two passes
    assert(m.count() == 2L * n)
    // a bucket within the cap gets the single (0, 0, 0) membership
    val healthy = SubBuckets.withMembership(
      skewed.limit(cap).select(col("label").as("__bk"), col("vec_id").as("id")),
      Seq(col("__bk")), col("id"), cap)
    assert(healthy.count() == cap.toLong)
    assert(healthy.select("__pass", "__sub", "__sub0").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq == Seq((0, 0L, 0L)))
  }

  test("oversized bucket emits each candidate pair exactly once, with the rank-distance recall floor") {
    // threshold below any cosine -> the output IS the candidate set
    val got = Similarity.cosinePairs(skewed, "embedding", "vec_id", "label",
        threshold = -2.0, maxBucket = cap)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // no pair emitted twice (the exactly-once filter, not a dedup shuffle)
    assert(got.length == got.toSet.size)
    // reference: same pass-0 chunk (rn/cap) or same half-offset pass-1 chunk
    val expected = (for {
      a <- 0 until n; b <- (a + 1) until n
      if a / cap == b / cap || (a + cap / 2) / cap == (b + cap / 2) / cap
    } yield (a.toLong, b.toLong)).toSet
    assert(got.toSet == expected)
    // recall floor: every pair within rank distance < cap/2 is present
    val close = (for { a <- 0 until n; b <- (a + 1) until n if b - a < cap / 2 }
      yield (a.toLong, b.toLong)).toSet
    assert(close.subsetOf(got.toSet))
    // and the work is bounded: at most n*cap pairs from the two passes
    assert(got.length <= n * cap)
  }

  test("buckets within the cap are bit-identical to the uncapped join") {
    val capped = Similarity.cosinePairs(skewed, "embedding", "vec_id", "label",
        threshold = 0.2, maxBucket = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = Similarity.cosinePairs(skewed, "embedding", "vec_id", "label",
        threshold = 0.2, maxBucket = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == uncapped && capped.nonEmpty)
  }

  test("knnGraph on an oversized bucket still ranks neighbors (was: empty)") {
    val g = Similarity.knnGraph(skewed, "embedding", "vec_id", "label",
      k = 2, maxBucket = cap)
    val rows = g.collect()
    assert(rows.nonEmpty)
    // every vector gets neighbors, nothing was dropped wholesale
    assert(g.select("id").distinct().count() == n.toLong)
    // no duplicate (id, nbr) edges from the two passes
    val edges = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length == edges.toSet.size)
  }

  test("semDedup bloom is sized from the drop-set: sliver stays proportional") {
    // 4 buckets x 300 rows; vectors are one-hot of (id % 50), so each
    // bucket holds 6 copies of each of 50 distinct vectors. Identical
    // vectors have cosine 1; distinct ones 0. Keeps = first 50 ids of
    // each bucket; drops = 1200 - 200 = 1000.
    val rows = 1200
    val corpus = (0 until rows).map { i =>
      val v = Array.fill(50)(0.0); v(i % 50) = 1.0
      (i.toLong, v, i / 300)
    }.toDF("vec_id", "embedding", "label")
    val (_, suspectedOpt) = Similarity.dropBloom(corpus, "embedding", "vec_id", "label", 0.9)
    val suspected = corpus.filter(suspectedOpt.get).count()
    // true drops = 1000; the sized bloom (capacity ~1250) keeps the FPP
    // near its 3% design point over the 200 kept rows — the sliver that
    // reaches the exact anti join is the drop-set plus a few percent,
    // NOT a fixed-capacity cliff that widens with corpus scale
    assert(suspected >= 1000L && suspected <= 1000L + 30L)
    // and the keep-list itself is exact
    val kept = Similarity.semDedup(corpus, "embedding", "vec_id", "label", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = (0 until 4).flatMap(b => (300 * b) until (300 * b + 50))
      .map(_.toLong).toSet
    assert(kept == expected)
  }
}
