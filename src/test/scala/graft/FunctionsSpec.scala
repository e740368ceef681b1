package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DateFns, PolyHash, TitleCase}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).head.getString(0)

  test("sasDate: SAS epoch day offsets, 0 maps to 1960-01-01 (ref etl.py:61-74)") {
    assert(evalStr(DateFns.sasDateStr(lit(0))) == "1960-01-01")
    assert(evalStr(DateFns.sasDateStr(lit(20566))) == "2016-04-22")
    assert(evalStr(DateFns.sasDateStr(lit(null).cast("int"))) == null)
  }

  test("sasDateZeroNull: Python-falsy guard, 0 maps to null (ref etl.py:119-125)") {
    assert(evalStr(DateFns.sasDateZeroNull(lit(0))) == null)
    assert(evalStr(DateFns.sasDateZeroNull(lit(20566))) == "2016-04-22")
    assert(evalStr(DateFns.sasDateZeroNull(lit(null).cast("int"))) == null)
  }

  test("sasDate round-trip: datediff(sasDate(n), 1960-01-01) == n (seeded sample)") {
    val rnd = new scala.util.Random(42)
    val ns = Seq.fill(200)(rnd.nextInt(100000))
    val got = ns.toDF("n")
      .select(col("n"), datediff(DateFns.sasDate(col("n")), to_date(lit("1960-01-01"))))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("stayDays matches depdate - arrdate in days (ref etl.py:76-90)") {
    val got = Seq(("2016-04-01", "2016-04-15")).toDF("a", "d")
      .select(DateFns.stayDays(to_date(col("a")), to_date(col("d"))))
      .head.getInt(0)
    assert(got == 14)
  }

  test("seasonOf buckets months like the reference CASE (ref etl.py:325-328)") {
    val got = (1 to 12).toDF("m").select(col("m"), DateFns.seasonOf(col("m")))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(12) == "winter" && got(1) == "winter" && got(2) == "winter")
    assert(got(3) == "spring" && got(5) == "spring")
    assert(got(6) == "summer" && got(8) == "summer")
    assert(got(9) == "autumn" && got(11) == "autumn")
  }

  test("TitleCase matches Python str.title() on its tricky cases (ref etl.py:105-117)") {
    val cases = Map(
      "o'neill" -> "O'Neill",          // apostrophe is a word boundary
      "a1b c"   -> "A1B C",            // digit is a boundary too
      "MEXICO"  -> "Mexico",
      "united states" -> "United States",
      "nation_0" -> "Nation_0",
      ""        -> "",
      "  x  "   -> "  X  ")
    cases.foreach { case (in, want) =>
      val got = Seq(in).toDF("s").select(TitleCase.titlecase(col("s"))).head.getString(0)
      assert(got == want, s"title($in)")
    }
    // null-safe
    assert(Seq[String](null).toDF("s").select(TitleCase.titlecase(col("s"))).head.isNullAt(0))
  }

  test("TitleCase is idempotent (seeded sample)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(100)(rnd.alphanumeric.take(12).mkString + " o'x _9a")
    val rows = samples.toDF("s")
      .select(TitleCase.titlecase(col("s")).as("once"),
        TitleCase.titlecase(TitleCase.titlecase(col("s"))).as("twice"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("TitleCase interpreted eval equals codegen eval") {
    // project over a non-literal column exercises codegen; literal folding
    // exercises interpreted eval — both must agree
    val df = Seq("o'neill 42x", "ä-öü").toDF("s")
    val viaCol = df.select(TitleCase.titlecase(col("s"))).collect().map(_.getString(0)).toSeq
    assert(viaCol == Seq("O'Neill 42X", "Ä-Öü"))
  }

  test("repetitionStats: known bigram multiset, one shuffle in the plan") {
    import graft.text.TextFns
    // "a b a b a" -> bigrams [a b, b a, a b, b a]: total 4, distinct 2,
    // dup_frac 0.5, top_frac 0.5; "x y z" -> 2 distinct of 2, dup 0, top 0.5
    val df = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "w")).toDF("doc_id", "text")
    val got = TextFns.repetitionStats(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((4L, 2L, 0.5, 0.5)))
    assert(got(2L) == ((2L, 2L, 0.0, 0.5)))
    assert(got(3L) == ((1L, 1L, 0.0, 1.0)))   // short doc: one whole-text gram
    // both aggregation levels ride the single explicit repartition —
    // exactly one exchange in the whole plan
    val plan = TextFns.repetitionStats(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    // the scan-only fold form: identical values, ZERO exchanges
    val scanOnly = TextFns.repetitionStatsScanOnly(df, "text", "doc_id")
    assert(!scanOnly.queryExecution.executedPlan.toString.contains("Exchange"))
    val so = scanOnly.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(so == got)
    // and on real documents, both forms agree everywhere
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextFns.repetitionStats(real, "text", "doc_id")
    val b = TextFns.repetitionStatsScanOnly(real, "text", "doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fleschEase and fkGrade match hand-computed counts; sentence floor applies") {
    import graft.text.TextFns
    // "go. stop now!": W=3, S=2 (runs of .!?), Y=3 vowel groups
    // "xyz": W=1, S floored to 1, Y=1 ("y" counts as vowel)
    val df = Seq("go. stop now!", "xyz").toDF("text")
    val out = df.select(col("text"), TextFns.fleschEase(col("text")).as("f"),
      TextFns.fkGrade(col("text")).as("g"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (f1, g1) = out("go. stop now!")
    assert(math.abs(f1 - (206.835 - 1.015 * 1.5 - 84.6)) < 1e-9)
    assert(math.abs(g1 - (0.39 * 1.5 + 11.8 - 15.59)) < 1e-9)
    val (f2, g2) = out("xyz")
    assert(math.abs(f2 - (206.835 - 1.015 - 84.6)) < 1e-9)
    assert(math.abs(g2 - (0.39 + 11.8 - 15.59)) < 1e-9)
  }

  test("redactPii masks emails and 555-phones; counts match") {
    import graft.text.TextFns
    val df = Seq(
      ("write to bob.smith+x@mail.example.org or call 5551234567 now", 1, 1),
      ("no pii here at all", 0, 0),
      ("two mails a@b.co c.d@e.io one phone 55500001", 2, 1)).toDF("t", "em", "ph")
    val got = df.select(TextFns.redactPii(col("t")).as("r"),
      TextFns.emailCount(col("t")).as("ne"), TextFns.phoneCount(col("t")).as("np"),
      col("em"), col("ph")).collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(3) && r.getInt(2) == r.getInt(4), r.toString)
    }
    assert(got(0).getString(0) == "write to <EMAIL> or call <PHONE> now")
    assert(got(2).getString(0) == "two mails <EMAIL> <EMAIL> one phone <PHONE>")
  }

  test("NfcNormalize composes decomposed sequences; interpreted == codegen; idempotent") {
    import graft.functions.NfcNormalize.nfcNormalize
    val df = Seq("e\u0301", "cafe\u0301", "plain", "").toDF("s")
    val got = df.select(nfcNormalize(col("s")).as("n"), length(col("s")).as("lr"),
      length(nfcNormalize(col("s"))).as("ln")).collect()
    assert(got(0).getString(0) == "\u00e9" && got(0).getInt(1) == 2 && got(0).getInt(2) == 1)
    assert(got(1).getString(0) == "caf\u00e9")
    assert(got(2).getString(0) == "plain")
    assert(got(3).getString(0) == "")
    // idempotence + null
    val again = df.select(nfcNormalize(nfcNormalize(col("s"))).as("n")).collect().map(_.getString(0))
    assert(again.toSeq == got.map(_.getString(0)).toSeq)
    assert(Seq(Tuple1(null: String)).toDF("s").select(nfcNormalize(col("s"))).head.isNullAt(0))
  }

  test("InterleaveBits: known morton codes, locality ordering") {
    import graft.functions.InterleaveBits.interleaveBits
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (0xFFFFFFFFL, 0xFFFFFFFFL))
      .toDF("a", "b")
    val got = df.select(interleaveBits(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 2L, 3L, 12L, -1L)) // full 32+32 bits -> all 64 bits set
  }

  test("WeightedAvg Aggregator equals the decimal-sum composition, handles zero weight") {
    import graft.functions.WeightedAvg
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val viaAgg = li.groupBy(col("l_returnflag"))
      .agg(WeightedAvg.weightedAvg(col("l_extendedprice"), col("l_quantity")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaSums = li.groupBy(col("l_returnflag"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)") * col("l_quantity").cast("decimal(18,2)"))
        .cast("double") / sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAgg == viaSums) // bit-identical: exact decimal sums, one double division
    val nan = Seq((1.0, 0.0)).toDF("v", "w")
      .agg(WeightedAvg.weightedAvg(col("v"), col("w"))).head.getDouble(0)
    assert(nan.isNaN)
  }

  test("PolyHash: known values, empty, null") {
    def ph(s: String): Long =
      Seq(s).toDF("s").select(PolyHash.polyHash(col("s"))).head.getLong(0)
    assert(ph("") == 0L)
    assert(ph("a") == 'a'.toLong)
    assert(ph("ab") == ('a' * 31 + 'b') % 1000000007L)
    assert(Seq[String](null).toDF("s").select(PolyHash.polyHash(col("s"))).head.isNullAt(0))
  }

  test("CmsEstimate: sketch never undercounts, tight for low-collision keys") {
    import graft.functions.CmsEstimate
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val sketch = CmsEstimate.buildSketch(li, "l_suppkey", eps = 0.001)
    val rows = li.groupBy(col("l_suppkey").cast("long").as("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("n"), CmsEstimate.cmsEstimate(sketch, col("k")).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, est) = (r.getLong(1), r.getLong(2))
      assert(est >= n, s"CMS undercounted key ${r.getLong(0)}: $est < $n")
      assert(est <= n + 600, s"CMS overcounted far past eps*N: $est vs $n")
    }
    // deterministic across builds (fixed seed)
    val sketch2 = CmsEstimate.buildSketch(li, "l_suppkey", eps = 0.001)
    assert(java.util.Arrays.equals(sketch, sketch2))
  }

  test("multimodal features feed ANN: decode -> deterministic embed -> top-k") {
    import graft.multimodal.Multimodal
    implicit val s = spark
    val media = Multimodal.synthesizeImages(
      Tables.documents(spark, "/root/testdata/sf0.001").limit(100), "doc_id")
    val feats = Multimodal.decodeImages(media).toDF()
    // embedding from REAL decoded features — deterministic
    val embedded = feats.select(col("media_id"),
      array(col("width").cast("float"), col("height").cast("float"),
        col("mean_r").cast("float"), col("mean_g").cast("float")).as("emb"))
    val q = embedded.filter(col("media_id") === embedded.select(min("media_id")).head.getLong(0))
    val top = graft.similarity.Similarity.bruteForceTopK(
      embedded, "emb", "media_id", q, "emb", 5).collect()
    assert(top.length == 5 && top.head.getDouble(1) == 1.0) // self-match first
    val again = graft.similarity.Similarity.bruteForceTopK(
      embedded, "emb", "media_id", q, "emb", 5).collect()
    assert(top.toSeq == again.toSeq)
  }

  test("GraftExtensions registers titlecase/poly_hash as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT titlecase('o\\'neill') AS t, poly_hash('ab') AS h").head
    assert(r.getString(0) == "O'Neill")
    assert(r.getLong(1) == ('a' * 31 + 'b') % 1000000007L)
  }

  test("JaroWinkler: textbook vectors, boost gating, empties, case, nulls, SQL registration") {
    import graft.functions.JaroWinkler.jaroWinkler
    val cases = Seq(
      ("martha", "marhta", 0.961111),   // transposed pair + prefix boost
      ("dixon", "dicksonx", 0.813333),
      ("jellyfish", "smellyfish", 0.896296), // no common prefix -> no boost
      ("crate", "trace", 0.733333),     // jaro > 0.7 but prefix 0
      ("ab", "aab", 0.611111),          // jaro <= 0.7: boost suppressed
      ("abcdef", "bcadef", 0.944444),   // odd half-transpositions floor to 1
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),                // window 0: no matches
      ("", "abc", 0.0), ("", "", 0.0),  // empty => 0 by convention
      ("ABC", "abc", 0.0))              // case-sensitive
    val df = cases.toDF("a", "b", "want")
      .withColumn("got", round(jaroWinkler($"a", $"b") + lit(1e-12), 6))
    assert(df.filter($"got" =!= $"want").count() == 0,
      df.filter($"got" =!= $"want").collect().mkString(", "))
    // null propagates
    val n = Seq(("x", Option.empty[String])).toDF("a", "b")
      .select(jaroWinkler($"a", $"b")).head
    assert(n.isNullAt(0))
    // SQL surface + codegen path on corpus data
    GraftExtensions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("jw_docs")
    val sql = spark.sql(
      "SELECT round(jaro_winkler(substr(text, 1, 8), lower(substr(text, 1, 8))), 6) AS v FROM jw_docs")
    assert(sql.filter($"v" < 0 || $"v" > 1).count() == 0 && sql.count() > 0)
  }

  test("CollapseTitleCase rule removes nested titlecase and inner lower") {
    GraftExtensions.register(spark)
    // non-literal input so constant folding can't collapse the whole tree
    val df = Tables.customer(spark, "/root/testdata/sf0.001")
      .select(TitleCase.titlecase(TitleCase.titlecase(lower(col("c_name")))).as("t"))
    val optimized = df.queryExecution.optimizedPlan
    val nTitle = optimized.expressions.map(_.collect {
      case t: graft.functions.TitleCase => t }.size).sum
    val nLower = optimized.expressions.map(_.collect {
      case l: org.apache.spark.sql.catalyst.expressions.Lower => l }.size).sum
    assert(nTitle == 1, s"expected 1 titlecase, plan: $optimized")
    assert(nLower == 0, s"expected no lower, plan: $optimized")
    assert(df.head.getString(0).startsWith("Customer#"))
  }
  test("luhn: textbook valid/invalid numbers and the empty edge") {
    import graft.functions.Luhn
    val df = Seq("79927398713", "79927398714", "4539578763621486", "")
      .toDF("d")
      .select(col("d"), Luhn.luhnValid(col("d")).as("v"))
    val m = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(m("79927398713"))        // the ISO 7812 worked example
    assert(!m("79927398714"))       // off-by-one check digit
    assert(m("4539578763621486"))   // a valid 16-digit PAN
    assert(!m(""))
  }

  test("WordNgrams equals the builtin composition; strict mode drops short docs") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), lower(col("text")).as("t"))
    val native = real
      .select(col("doc_id"), graft.text.TextFns.allNgrams(col("t"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val builtin = real
      .select(col("doc_id"),
        graft.text.TextFns.allNgramsViaBuiltins(col("t"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.size == 500 && native == builtin)
    // edge cases: short doc, double space (empty tokens), empty string
    val edges = Seq("one", "a  b", "", "x y z").toDF("t")
    val n2 = edges.select(graft.functions.WordNgrams.wordNgrams(col("t"), 2))
      .collect().map(_.getSeq[String](0)).toSeq
    val b2 = edges
      .select(graft.text.TextFns.allNgramsViaBuiltins(col("t"), 2))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(n2 == b2)
    // strict mode: < n tokens -> empty array (explode then drops the doc)
    val s2 = edges
      .select(graft.functions.WordNgrams.wordNgramsStrict(col("t"), 2))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(s2 == Seq(Seq(), Seq("a ", " b"), Seq(), Seq("x y", "y z")))
  }

  test("longDot edge semantics match the aggregate(zip_with) fold, codegen and interpreted") {
    import graft.functions.LongDot.longDot
    // the fold LongDot replaced, verbatim from the old fixed-point models
    def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)
    val rows = Seq(
      (1L, Seq[java.lang.Long](2L, 3L), Seq[java.lang.Long](4L, 5L)),   // clean: 23
      (2L, Seq[java.lang.Long](2L, null), Seq[java.lang.Long](4L, 5L)), // null element -> null
      (3L, Seq[java.lang.Long](2L), Seq[java.lang.Long](4L, 5L)),       // length mismatch -> null
      (4L, Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]),       // empty -> 0
      (5L, null.asInstanceOf[Seq[java.lang.Long]], Seq[java.lang.Long](1L)) // null array -> null
    ).toDF("id", "a", "b")
    // codegen context: top-level Project
    val top = rows.select(col("id"), longDot(col("a"), col("b")).as("n"),
        foldDot(col("a"), col("b")).as("o"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    top.foreach { case (id, (n, o)) => assert(n == o, s"row $id: $n vs $o") }
    assert(top(1L)._1 == 23L && top(4L)._1 == 0L && top(2L)._1 == null
      && top(3L)._1 == null && top(5L)._1 == null)
    // interpreted context: the same expression INSIDE a lambda body
    // (transform is CodegenFallback, so longDot runs through nullSafeEval)
    val inLambda = rows.select(col("id"),
        transform(array(col("a")), aa => longDot(aa, col("b"))).getItem(0).as("n"),
        transform(array(col("a")), aa => foldDot(aa, col("b"))).getItem(0).as("o"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    inLambda.foreach { case (id, (n, o)) => assert(n == o, s"row $id: $n vs $o") }
    assert(inLambda(1L)._1 == 23L)
  }

  test("longDot preserves the ANSI fail-fast on long overflow, like the fold it replaced") {
    val df = Seq((Seq(Long.MaxValue, 1L), Seq(2L, 1L))).toDF("a", "b")
    val e = intercept[Exception](
      df.select(graft.functions.LongDot.longDot(col("a"), col("b"))).collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]), e.toString)
  }
}
