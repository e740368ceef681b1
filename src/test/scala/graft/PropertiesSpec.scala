package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Property-based checks: the distributed operators against tiny
  * driver-side reference implementations over RANDOM structures — the
  * shapes example-based tests never think to write. Generators are
  * ScalaCheck's, driven with fixed seeds so CI failures reproduce.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Gen.Parameters.default
  private def cases[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(params, Seed(42L + i)))

  private val graphGen: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.choose(2, 14)
    m <- Gen.choose(0, 20)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong)
    } yield (math.min(a, b), math.max(a, b)))
  } yield (n, edges.filter { case (a, b) => a != b })

  test("clusters == driver-side union-find on random graphs (seeded, 8 cases)") {
    cases(graphGen, 8).foreach { case (n, edges) =>
      val ids = 1L to n.toLong
      // reference union-find with min-label canonicalization
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = ids.map(i => i -> find(i)).toMap
      val got = Dedup.clusters(ids.toDF("id"), edges.toDF("id_a", "id_b"),
          "id", "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n edges=$edges")
    }
  }

  private val docPairGen: Gen[(String, String)] = {
    val vocab = Vector("a", "b", "c", "d", "e")
    val doc = Gen.choose(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    Gen.zip(doc, doc)
  }

  test("jaccardOnPairs == set-arithmetic jaccard on random word docs (seeded, 8 cases)") {
    cases(docPairGen, 8).foreach { case (t1, t2) =>
      def sh(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length < 3) Set(w.mkString(" "))
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val (s1, s2) = (sh(t1), sh(t2))
      val want = (s1 & s2).size.toDouble / (s1 | s2).size
      val got = Dedup.jaccardOnPairs(
          Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"),
          "text", "doc_id", Seq((1L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b", 3)
        .head().getDouble(2)
      assert(math.abs(got - want) < 1e-12, s"t1='$t1' t2='$t2'")
    }
  }

  private val wordDocGen: Gen[String] = {
    val vocab = Vector("a", "bb", "ccc", "d", "ee")
    Gen.choose(1, 15).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
  }

  test("firstOccurrenceDedup == driver-side distinct-preserving-order (seeded, 10 cases)") {
    import graft.text.Curation
    cases(wordDocGen, 10).foreach { doc =>
      val want = doc.split(" ").distinct.mkString(" ") // Scala distinct keeps first occurrence
      val row = Curation.firstOccurrenceDedup(
        Seq((1L, doc)).toDF("doc_id", "text"), "text", "doc_id").head()
      assert(row.getString(1) == want, s"doc='$doc'")
      assert(row.getLong(2) == doc.split(" ").length)
      assert(row.getLong(3) == doc.split(" ").distinct.length)
    }
  }

  test("firstOccurrenceDedup is idempotent on random docs (seeded, 6 cases)") {
    import graft.text.Curation
    cases(wordDocGen, 6).foreach { doc =>
      val once = Curation.firstOccurrenceDedup(
        Seq((1L, doc)).toDF("doc_id", "text"), "text", "doc_id")
        .head().getString(1)
      val twice = Curation.firstOccurrenceDedup(
        Seq((1L, once)).toDF("doc_id", "text"), "text", "doc_id")
        .head().getString(1)
      assert(twice == once, s"doc='$doc'")
    }
  }

  test("temperatureWeights: mix weights sum to 1 and order-match n^alpha on random splits (seeded, 6 cases)") {
    import graft.text.Curation
    val splitGen = Gen.choose(2, 6).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 40)))
    cases(splitGen, 6).foreach { sizes =>
      val docs = sizes.zipWithIndex.flatMap { case (n, si) =>
        (1 to n).map(i => (s"s$si", i.toLong))
      }.toDF("source", "doc_id")
      val rows = Curation.temperatureWeights(docs, "source", alpha = 0.7)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
      val totalW = rows.values.map(_._2).sum
      assert(math.abs(totalW - 1.0) < 1e-3, s"sizes=$sizes sum=$totalW") // rounded to 6dp each
      // monotone: larger source never gets a smaller mix weight
      val bySize = rows.values.toSeq.sortBy(_._1)
      bySize.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 <= b._2 + 1e-9, s"sizes=$sizes")
        case _ =>
      }
      assert(rows.values.forall(v => v._3 > 0 && v._3 <= 1.0)) // rates in (0,1]
      assert(rows.values.exists(_._3 == 1.0)) // someone keeps 100%
    }
  }

  test("TitleCase matches a Python str.title() reference on random strings (seeded, 40 cases)") {
    def pyTitle(s: String): String = {
      val sb = new StringBuilder
      var prevCased = false
      s.foreach { c =>
        val cased = c.isLetter
        sb.append(
          if (cased && !prevCased) c.toUpper
          else if (cased) c.toLower else c)
        prevCased = cased
      }
      sb.toString
    }
    val strGen = Gen.listOfN(12,
      Gen.frequency(6 -> Gen.alphaChar, 2 -> Gen.numChar,
        2 -> Gen.oneOf(' ', '\'', '_', '-'))).map(_.mkString)
    val inputs = cases(strGen, 40)
    val got = inputs.toDF("s")
      .select(col("s"), graft.functions.TitleCase.titlecase(col("s")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach(s => assert(got(s) == pyTitle(s), s"input='$s'"))
  }
  test("hierarchy == driver-side parent walk on random forests (seeded, 8 cases)") {
    import graft.graph.Hierarchy
    val forestGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(2, 30)
      parents <- Gen.sequence[Seq[Long], Long](
        (1 until n).map(i => Gen.choose(0L, (i - 1).toLong)))
    } yield (0L, 0L) +: (1 until n).map(i => (i.toLong, parents(i - 1)))
    cases(forestGen, 8).foreach { rows =>
      val pmap = rows.toMap
      def walk(x: Long): (Long, Long) = {
        var (c, d) = (x, 0L)
        while (pmap(c) != c) { c = pmap(c); d += 1 }
        (c, d)
      }
      val got = Hierarchy.resolve(rows.toDF("id", "parent"), "id", "parent",
          maxDepth = 64)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      rows.foreach { case (id, _) =>
        assert(got(id) == walk(id), s"node $id in $rows")
      }
    }
  }

  test("luhn: appending the computed check digit always validates (seeded, 40 cases)") {
    import graft.functions.Luhn
    val numGen: Gen[String] = for {
      len <- Gen.choose(6, 18)
      ds <- Gen.listOfN(len, Gen.choose(0, 9))
    } yield ds.mkString
    val inputs = cases(numGen, 40)
    // driver-side reference: check digit that makes (body + digit) valid
    def checkDigit(body: String): Int = {
      val s = body.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 0) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      (10 - s % 10) % 10
    }
    val full = inputs.map(b => b + checkDigit(b))
    val got = full.toDF("d")
      .select(col("d"), Luhn.luhnValid(col("d")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    full.foreach(f => assert(got(f), s"'$f' should Luhn-validate"))
  }

  test("viterbi cost is bounded above by the char-by-char decomposition (seeded)") {
    import graft.text.UnigramLm
    // vocab: all single chars plus some multi-char symbols
    val chars = "abcd".map(_.toString)
    val vocab = (chars.map(_ -> 5L) ++
      Seq("ab" -> 9L, "cd" -> 7L, "abc" -> 3L, UnigramLm.Eow -> 20L))
      .toDF("sym", "n_occurrences")
    val costs = UnigramLm.costTable(vocab, "sym", "n_occurrences")
    val cm = costs.toMap
    val wordGen: Gen[String] = for {
      len <- Gen.choose(1, 8)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val words = cases(wordGen, 25).distinct
    val got = UnigramLm.viterbiSegment(
        words.zipWithIndex.map { case (w, i) => (w, i.toLong + 1) }
          .toDF("word", "cnt"), costs)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    words.foreach { w =>
      val charCost = w.map(c => cm(c.toString)).sum + cm(UnigramLm.Eow)
      assert(got(w) <= charCost + 1e-9, s"word '$w': ${got(w)} > $charCost")
      assert(got(w) > 0.0)
    }
  }

  private val scoreLabelGen: Gen[List[(Double, Boolean)]] = for {
    n <- Gen.choose(3, 40)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0, 99)
      y <- Gen.oneOf(true, false)
    } yield (s / 100.0, y))
  } yield rows

  test("isotonic fit is monotone nondecreasing and mean-preserving on random data (seeded, 8 cases)") {
    cases(scoreLabelGen, 8).foreach { rows =>
      val fit = graft.operators.Isotonic
        .fit(rows.toDF("s", "y"), "s", "y", digits = 2)
        .orderBy("score")
        .select("score", "n", "pos", "iso_p")
        .as[(Double, Long, Long, Double)].collect()
      // monotone (up to the 6-dp output rounding)
      fit.sliding(2).foreach {
        case Array((_, _, _, a), (_, _, _, b)) => assert(b >= a - 1e-6)
        case _ =>
      }
      // weighted mean of the fit equals the label mean (PAVA preserves mass)
      val fitMass = fit.map { case (_, n, _, p) => n * p }.sum
      val posMass = fit.map(_._3).sum.toDouble
      assert(math.abs(fitMass - posMass) < 1e-3 * fit.length,
        s"mass $fitMass vs $posMass")
    }
  }

  test("quantileNormalize lands in (0,1) and is monotone in the value (seeded, 6 cases)") {
    val gen = Gen.listOfN(30, Gen.choose(-50, 50).map(_.toDouble / 7))
    cases(gen, 6).foreach { vs =>
      val out = graft.operators.RankedStats
        .quantileNormalize(vs.toDF("v"), Nil, "v")
        .select("v", "q_uniform").as[(Double, Double)].collect()
      assert(out.forall { case (_, q) => q > 0.0 && q < 1.0 })
      val byV = out.toSeq.sortBy(_._1)
      byV.sliding(2).foreach {
        case Seq((v1, q1), (v2, q2)) =>
          if (v1 == v2) assert(q1 == q2) else assert(q2 > q1)
        case _ =>
      }
    }
  }

  test("cochranQ with k = 2 equals McNemar's uncorrected chi2 on random paired flags (seeded, 6 cases)") {
    val gen = Gen.listOfN(25, for {
      a <- Gen.oneOf(true, false); b <- Gen.oneOf(true, false)
    } yield (a, b))
    cases(gen, 6).foreach { ps =>
      val paired = ps.zipWithIndex
      val long = paired.flatMap { case ((a, b), i) =>
        Seq((i.toLong, "A", a), (i.toLong, "B", b)) }
      val q = graft.operators.PairedTests
        .cochranQ(long.toDF("blk", "trt", "x"), "blk", "trt", "x").head
      val m = graft.operators.PairedTests
        .mcnemar(ps.toDF("a", "b"), "a", "b").head
      (Option(q.get(q.fieldIndex("q_stat"))),
        Option(m.get(m.fieldIndex("mcnemar_chi2")))) match {
        case (Some(qs), Some(ms)) =>
          assert(math.abs(qs.asInstanceOf[Double] - ms.asInstanceOf[Double]) < 1e-6)
        case (qs, ms) =>
          // both degenerate together (no discordant pairs <=> denominator 0)
          assert(qs.isEmpty == ms.isEmpty)
      }
    }
  }

  test("psmMatch picks the greatest control score <= treated on random scores (seeded, 6 cases)") {
    val gen = for {
      n <- Gen.choose(6, 30)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0L, 40L); t <- Gen.oneOf(0, 1); y <- Gen.choose(0L, 5L)
      } yield (s, t, y))
    } yield rows.zipWithIndex.map { case ((s, t, y), i) => (i.toLong, s, t, y) }
    cases(gen, 6).foreach { units =>
      val got = graft.operators.Causal
        .psmMatch(units.toDF("id", "s", "t", "y"), "id", "s", "t", "y")
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      val controls = units.filter(_._3 == 0)
      units.filter(_._3 == 1).foreach { case (id, s, _, _) =>
        val eligible = controls.filter(_._2 <= s)
        got(id) match {
          case Some(cid) =>
            val best = eligible.map(_._2).max
            // matched the best score, and within it the smallest id
            val expected = eligible.filter(_._2 == best).map(_._1).min
            assert(cid == expected, s"treated $id: got $cid expected $expected")
          case None => assert(eligible.isEmpty)
        }
      }
    }
  }

  test("conformal coverage honors the finite-sample bound on noisy planes (seeded, 5 cases)") {
    val gen = for {
      n <- Gen.choose(40, 80)
      rows <- Gen.listOfN(n, for {
        x1 <- Gen.choose(0, 20); x2 <- Gen.choose(0, 20); e <- Gen.choose(-300, 300)
      } yield (x1.toDouble, x2.toDouble, 1.0 + 2.0 * x1 - x2 + e / 100.0))
    } yield rows.zipWithIndex.map { case ((a, b, y), i) => (i.toLong, a, b, y) }
    cases(gen, 5).foreach { pts =>
      val r = graft.ml.Conformal.ols2Interval(pts.toDF("id", "x1", "x2", "y"),
        Seq("id"), "x1", "x2", "y", alpha = 0.2).head
      val nCal = r.getAs[Long]("n_cal")
      if (nCal >= 5) {
        // coverage >= k/n with k = min(ceil((n+1)(1-alpha)), n)
        val k = math.min(math.ceil((nCal + 1) * 0.8), nCal.toDouble)
        // coverage_cal is rounded to 6 decimals — compare on that grid
        assert(r.getAs[Double]("coverage_cal") >= k / nCal - 5e-7)
        assert(r.getAs[Double]("q_hat") >= 0.0)
      }
    }
  }

  test("wilcoxonSignedRank: swapping x and y reflects W+ around n(n+1)/2 (seeded, 6 cases)") {
    val gen = Gen.listOfN(20, for {
      x <- Gen.choose(1, 100); y <- Gen.choose(1, 100)
    } yield (x.toDouble, y.toDouble))
    cases(gen, 6).foreach { ps =>
      val fwd = graft.operators.PairedTests
        .wilcoxonSignedRank(ps.toDF("x", "y"), "x", "y").head
      val rev = graft.operators.PairedTests
        .wilcoxonSignedRank(ps.map(_.swap).toDF("x", "y"), "x", "y").head
      val n = fwd.getAs[Long]("n").toDouble
      assert(rev.getAs[Long]("n") == fwd.getAs[Long]("n"))
      if (n > 0)
        assert(math.abs(fwd.getAs[Double]("w_plus") + rev.getAs[Double]("w_plus")
          - n * (n + 1) / 2) < 1e-6)
    }
  }

  test("VersionedTable replay == driver-side log fold on random commit sequences (seeded, 4 cases)") {
    import graft.sources.VersionedTable
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-vtp")
        .toString + "/tbl"
      val nCommits = 3 + rnd.nextInt(6)
      // reference: fold the same (mode, rows) sequence driver-side
      var ref = Vector.empty[Seq[(Long, Long)]]
      val committed = (0 until nCommits).map { i =>
        val rows = Seq.fill(1 + rnd.nextInt(4))(
          (rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong))
        val mode = if (i == 0 || rnd.nextBoolean()) "overwrite" else "append"
        if (mode == "overwrite") ref = Vector(rows) else ref = ref :+ rows
        val v = VersionedTable.commit(rows.toDF("k", "v"), t, mode)
        (v, ref.flatten.sorted) // expected multiset at this version
      }
      committed.foreach { case (v, want) =>
        val got = VersionedTable.readVersion(spark, t, v)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got == want, s"version $v of $t")
      }
      assert(VersionedTable.history(t).map(_.version) == (0L until nCommits.toLong))
    }
  }

  test("deriveMinhashBanding: minimal admissible divisor on a parameter grid") {
    def catchProb(k: Int, b: Int, s: Double): Double = {
      val r = k / b
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    }
    for {
      k <- Seq(8, 16, 24, 32, 48, 64, 128)
      s <- Seq(0.1, 0.2, 0.3, 0.5, 0.7, 0.85, 0.95)
      t <- Seq(0.5, 0.8, 0.9, 0.95, 0.99)
    } {
      val b = Dedup.deriveMinhashBanding(k, s, t)
      assert(k % b == 0, s"b=$b does not divide k=$k")
      val admissible = catchProb(k, b, s) >= t
      // either the theorem bound holds, or we hit the b = k fallback
      // (rows = 1) because NO divisor split reaches the target
      if (!admissible)
        assert(b == k &&
          (1 to k).filter(k % _ == 0).forall(catchProb(k, _, s) < t),
          s"k=$k s=$s t=$t chose inadmissible b=$b that is not the fallback")
      // minimality: every coarser split (fewer bands -> fewer false
      // positives was already preferred) must MISS the target
      (1 until b).filter(k % _ == 0).foreach { smaller =>
        assert(catchProb(k, smaller, s) < t,
          s"k=$k s=$s t=$t: b=$b not minimal, b=$smaller admissible")
      }
    }
  }

  test("derived banding holds its catch-rate empirically on adversarial similarity mixes (seeded)") {
    // MinHash's defining property: P[one signature slot agrees] = the
    // pair's true jaccard, independently per hash family. Simulating the
    // k slots as Bernoulli(s) draws lets us Monte-Carlo the banding
    // catch-rate exactly where the theorem is weakest: pairs sitting AT
    // the threshold (the adversarial mix — everything the corpus
    // guarantees). 400 seeded trials, 3σ tolerance.
    val rnd = new scala.util.Random(42)
    def caught(k: Int, b: Int, s: Double): Boolean = {
      val r = k / b
      val slots = Array.fill(k)(rnd.nextDouble() < s)
      (0 until b).exists(band => (0 until r).forall(i => slots(band * r + i)))
    }
    for {
      k <- Seq(16, 32, 64)
      s <- Seq(0.3, 0.5, 0.8)
      t <- Seq(0.8, 0.95)
    } {
      val b = Dedup.deriveMinhashBanding(k, s, t)
      val n = 400
      val hits = (1 to n).count(_ => caught(k, b, s))
      val tol = 3.0 * math.sqrt(t * (1 - t) / n)
      assert(hits.toDouble / n >= t - tol,
        s"k=$k s=$s t=$t b=$b: empirical catch ${hits.toDouble / n} < $t - $tol")
      // pairs far BELOW the threshold must stay mostly uncaught when the
      // split has selectivity (rows > 1): the same formula bounds the
      // false-positive rate, and the empirical rate must respect it
      if (k / b > 1) {
        val sLow = s / 4
        val fpBound = 1.0 - math.pow(1.0 - math.pow(sLow, k / b), b)
        val fps = (1 to n).count(_ => caught(k, b, sLow))
        assert(fps.toDouble / n <= fpBound + 0.08,
          s"k=$k s=$s b=$b: low-sim catch ${fps.toDouble / n} > bound $fpBound")
      }
    }
  }
}
