package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE tokenizer training: hand-computed merges on the classic corpus,
  * then a differential check of the distributed trainer against a
  * single-node reference implementation on the real sf0.001 corpus —
  * the same batch-vs-independent-implementation discipline as the
  * streaming dedup spec. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Single-node canonical BPE (greedy, left-to-right non-overlapping,
    * ties lexicographic on (a, b)) — the oracle for the differential
    * test. Plain Scala, no Spark. */
  private def referenceBpe(words: Map[String, Long],
                           nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) =>
        (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> c
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.length < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("train reproduces the hand-computed merges on the classic corpus") {
    // Sennrich's worked example shape: suffix 'est</w>' should win.
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest").toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // 9 'est' words: (e,s)=9 wins first (ties on 9 broken lexically:
    // (e,s) < (s,t) < (t,</w>)), then (es,t)=9, then (est,</w>)=9,
    // then (l,o)=7.
    assert(merges(0) == ((1L, "e", "s", 9L)), merges.mkString(","))
    assert(merges(1) == ((2L, "es", "t", 9L)))
    assert(merges(2) == ((3L, "est", "</w>", 9L)))
    assert(merges(3) == ((4L, "l", "o", 7L)))
  }

  test("applyMerge fold is left-to-right non-overlapping (aaa -> [aa, a])") {
    val docs = Seq("aaa aaaa").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val merges = Bpe.train(docs, "text", nMerges = 1).collect()
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "a")
    // count of (a,a) pairs: 'aaa' has 2, 'aaaa' has 3 -> 5
    assert(merges(0).getLong(3) == 5L)
  }

  test("distributed train matches the single-node reference on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val words = Bpe.wordTable(docs, "text")
      .select("word", "cnt").as[(String, Long)].collect().toMap
    val expected = referenceBpe(words, nMerges = 25)
    val got = Bpe.train(docs, "text", nMerges = 25).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"distributed=${got.take(8)} reference=${expected.take(8)}")
  }

  test("batched merging picks symbol-disjoint pairs and stays valid") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val merges = Bpe.train(docs, "text", nMerges = 12, mergesPerRound = 4)
      .collect().map(r => (r.getString(1), r.getString(2)))
    // every merge pair must be buildable from its predecessors' outputs
    // or single chars — i.e. the merge list is a valid derivation.
    val known = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      def ok(s: String) =
        s.length == 1 || s == Bpe.EndOfWord || known.contains(s)
      assert(ok(a) && ok(b), s"merge ($a,$b) uses an underivable symbol")
      known += a + b
    }
    assert(merges.length == 12)
  }

  test("tokenStats compresses and is consistent (n_subwords <= chars+1 per word)") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val mergeRows = Bpe.train(docs, "text", nMerges = 20).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val stats = Bpe.tokenStats(docs, "text", "doc_id", mergeRows)
    val row = stats.agg(sum("n_words"), sum("n_subwords")).head()
    val (nw, ns) = (row.getLong(0), row.getLong(1))
    // with the </w> marker, untrained would be chars+1 per word; after
    // 20 merges the corpus must compress strictly below that bound and
    // stay at or above one subword per word.
    val chars = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")))).head().getLong(0)
    assert(ns < chars + nw, s"no compression: ns=$ns chars+nw=${chars + nw}")
    assert(ns >= nw)
    assert(stats.filter(col("subword_ratio") < 1.0).count() == 0)
  }

  test("unigramLm: Viterbi picks the cheaper decomposition, hand-checked") {
    import graft.text.UnigramLm
    // vocab over chars a, b plus the merged 'ab' and markers; costs from
    // counts 4:2:2:8 (total 16): cost(a)=ln4, cost(b)=ln8, cost(ab)=ln8,
    // cost(eow)=ln2 -> "ab"+eow: path a|b = ln4+ln8+ln2, path ab = ln8+ln2
    val vocab = Seq(("a", 4L), ("b", 2L), ("ab", 2L), ("</w>", 8L))
      .toDF("sym", "n_occurrences")
    val costs = UnigramLm.costTable(vocab, "sym", "n_occurrences")
    val cm = costs.toMap
    assert(math.abs(cm("a") - math.log(4.0)) < 1e-5)
    assert(math.abs(cm(UnigramLm.Eow) - math.log(2.0)) < 1e-5)
    val words = Seq(("ab", 3L), ("a", 1L), ("ba", 1L)).toDF("word", "cnt")
    val out = UnigramLm.viterbiSegment(words, costs)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // "ab": single piece ln8 beats a|b = ln4+ln8
    assert(math.abs(out("ab") - (math.log(8.0) + math.log(2.0))) < 1e-4,
      s"ab cost ${out("ab")}")
    assert(math.abs(out("a") - (math.log(4.0) + math.log(2.0))) < 1e-4)
    // "ba" must use b|a (no 'ba' symbol)
    assert(math.abs(out("ba") - (math.log(8.0) + math.log(4.0) + math.log(2.0))) < 1e-4)
  }

  test("unigramLm: corpus words always reach the final state; guards fire") {
    import graft.text.UnigramLm
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val merges = Bpe.train(docs, "text", nMerges = 10).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val costs = UnigramLm.costTable(
      Bpe.vocabulary(docs, "text", merges), "sym", "n_occurrences")
    val seg = UnigramLm.viterbiSegment(
      Bpe.wordTable(docs, "text").select(col("word"), col("cnt")), costs)
    // every word segments finitely (its own merged decomposition exists)
    assert(seg.filter(col("viterbi_cost") >= 1e17).count() == 0)
    assert(seg.filter(col("viterbi_cost") <= 0.0).count() == 0)
    intercept[IllegalArgumentException](
      UnigramLm.viterbiSegment(Seq(("ab", 1L)).toDF("word", "cnt"), costs,
        maxLen = 2))
    intercept[IllegalArgumentException](
      UnigramLm.viterbiSegment(Seq(("ab", 1L)).toDF("word", "cnt"), Seq.empty))
  }

  /** The interpreted fold-of-folds [[graft.functions.ViterbiCost]]
    * replaced, verbatim from the old viterbiSegment (rounded consumer
    * included), as the differential reference. */
  private def oldViterbiCost(costs: Seq[(String, Double)]): org.apache.spark.sql.Column = {
    import graft.text.UnigramLm.Eow
    val costMap = map_from_arrays(
      typedLit(costs.map(_._1)), typedLit(costs.map(_._2)))
    val wx = concat(col("word"), lit(Eow))
    val n = length(col("word")) + lit(1)
    val best = aggregate(sequence(lit(1), n), array(lit(0.0)),
      (bst: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
        concat(bst, array(array_min(
          transform(sequence(lit(0), i - 1), j =>
            element_at(bst, j + 1) + coalesce(
              element_at(costMap, wx.substr(j + lit(1), i - j)),
              lit(1e18)))))))
    round(element_at(best, n + 1) + lit(1e-12), 6)
  }

  test("viterbiCost expression is bit-identical to the interpreted fold it replaced") {
    import graft.text.UnigramLm
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val merges = Bpe.train(docs, "text", nMerges = 10).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val costs = UnigramLm.costTable(
      Bpe.vocabulary(docs, "text", merges), "sym", "n_occurrences")
    val words = Bpe.wordTable(docs, "text").select(col("word"), col("cnt"))
    val diff = UnigramLm.viterbiSegment(words, costs)
      .join(words.select(col("word"), oldViterbiCost(costs).as("old_cost")), "word")
      .filter(col("viterbi_cost") =!= col("old_cost") ||
        col("viterbi_cost").isNull =!= col("old_cost").isNull)
    assert(diff.count() == 0, diff.take(5).mkString("; "))
  }

  test("viterbiCost edges: absent symbols, multibyte code points, null word") {
    import graft.text.UnigramLm
    // vocab with a 2-code-point symbol and a supplementary-plane char;
    // 'zq' has NO covering symbols except per-char fallbacks, and 'x'
    // is entirely absent (final cost rides the 1e18 absent lane)
    val costs = Seq(("a", 1.5), ("b", 2.25), ("ab", 3.0), ("😀", 0.5),
      (UnigramLm.Eow, 0.25), ("z", 7.0), ("q", 7.0))
    val words = Seq("ab", "ba", "zq", "x", "😀a", null)
      .map(w => (w, 1L)).toDF("word", "cnt")
    // both forms in ONE select — no join, so the null word row compares too
    val newCost = round(graft.functions.ViterbiCost.viterbiCost(
      concat(col("word"), lit(UnigramLm.Eow)), costs.toMap) + lit(1e-12), 6)
    val got = words.select(col("word"), newCost.as("new_cost"),
      oldViterbiCost(costs).as("old_cost")).collect()
    assert(got.length == 6)
    got.foreach { r =>
      val a = if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[AnyRef]
      val b = if (r.isNullAt(2)) null else r.getDouble(2).asInstanceOf[AnyRef]
      assert(a == b, s"word=${r.get(0)}: new=$a old=$b")
      if (r.get(0) == null) assert(a == null)
    }
    // supplementary char counts ONE DP position (code points, not UTF-16
    // units): emoji(0.5) + a(1.5) + eow(0.25) = 2.25
    val emoji = UnigramLm.viterbiSegment(
      Seq(("😀a", 1L)).toDF("word", "cnt"), costs)
      .head().getAs[Double]("viterbi_cost")
    assert(emoji == 2.25, s"$emoji")
  }
}
