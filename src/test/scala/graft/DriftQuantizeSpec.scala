package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift
import graft.similarity.{Quantize, Similarity}
import graft.text.TextFns

/** Round-3 additions: drift report, int8 quantization, semantic dedup
  * keep-list, token entropy.
  */
class DriftQuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // -- Drift ------------------------------------------------------------

  test("drift: identical snapshots give zero divergence terms everywhere") {
    val df = Seq("a", "a", "b", "c").toDF("k")
    val out = Drift.categoricalDrift(df, df, "k").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0)
    }
  }

  test("drift: category absent from one side stays finite and contributes positive KL") {
    val a = Seq("x", "x", "x", "y").toDF("k")
    val b = Seq("y", "y", "y", "y").toDF("k")
    val rows = Drift.categoricalDrift(a, b, "k").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("x", "y"))
    val x = rows("x")
    assert(x.getLong(2) == 0L)                  // n_b = 0
    assert(!x.getDouble(5).isNaN && !x.getDouble(5).isInfinite)
    assert(x.getDouble(5) > 0)                  // p >> q => positive KL term
    // summed KL and JS are non-negative; JS (base e) bounded by ln 2
    val kl = rows.values.map(_.getDouble(5)).sum
    val js = rows.values.map(_.getDouble(6)).sum
    assert(kl > 0 && js > 0 && js <= math.log(2.0) + 1e-9)
  }

  test("drift: each snapshot is scanned exactly once — totals come from a window, not a join recompute") {
    val ev = Tables.events(spark, DriftQuantizeSpec.sf)
    val plan = Drift.categoricalDrift(
      ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1), "event_type")
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 2, plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("numericDrift: identical snapshots give equal-population decile bins with zero terms") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val rows = Drift.numericDrift(df, df, "v", bins = 10).orderBy("bin").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    // reference deciles of 1..100 split it into 10 equal-population bins
    assert(rows.forall(_.getAs[Long]("n_a") == 10L))
    rows.foreach { r =>
      assert(r.getAs[Double]("kl_term") == 0.0 &&
        r.getAs[Double]("js_term") == 0.0 && r.getAs[Double]("psi_term") == 0.0)
    }
  }

  test("numericDrift: a location shift concentrates snapshot b in the top bin") {
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val b = (1 to 100).map(_ + 1000.0).toDF("v")   // all past a's last edge
    val rows = Drift.numericDrift(a, b, "v", bins = 10).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    assert(rows(9L).getAs[Long]("n_b") == 100L)
    assert((0L to 8L).forall(i => rows(i).getAs[Long]("n_b") == 0L))
    // every term finite under smoothing, and the shifted mass dominates PSI
    assert(rows.values.forall(r => !r.getAs[Double]("psi_term").isInfinite))
    assert(rows(9L).getAs[Double]("psi_term") > 0)
    // bins must come from side A only: b's values never move the edges
    assert(rows(0L).getAs[Long]("n_a") == 10L)
  }

  // -- Quantize ---------------------------------------------------------

  test("quantize: reconstruction error bounded by one quantization step") {
    val emb = Tables.embeddings(spark, DriftQuantizeSpec.sf)
    val out = Quantize.report(emb, "embedding", "vec_id")
    // |x - recon| <= scale for every element (floor quantization)
    assert(out.filter(col("max_err") > col("scale") + 1e-9).count() == 0)
    assert(out.count() == emb.count())
  }

  test("quantize: constant vector quantizes to zero codes with zero error") {
    val df = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val r = Quantize.report(df, "embedding", "vec_id").head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(3) == 0.0) // scale
    assert(r.getLong(4) == 0L)    // code_sum
    assert(r.getDouble(5) == 0.0) // max_err
  }

  test("quantize: plan is scan-only — no exchange, stays in one codegen stage") {
    val emb = Tables.embeddings(spark, DriftQuantizeSpec.sf)
    val plan = Quantize.report(emb, "embedding", "vec_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // -- SemDeDup ---------------------------------------------------------

  test("semDedup: kept set = corpus minus drop-set; every dropped vec has a lower-id neighbor") {
    val emb = Tables.embeddings(spark, DriftQuantizeSpec.sf)
    val kept = Similarity.semDedup(emb, "embedding", "vec_id", "label", 0.35)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    val allIds = emb.select("vec_id").as[Long].collect().toSet
    val dropped = allIds -- keptIds
    assert(keptIds.subsetOf(allIds) && kept.count() == keptIds.size)
    // dropped vecs are exactly the id_b side of above-threshold pairs
    val pairDropped = Similarity.cosinePairs(emb, "embedding", "vec_id", "label", 0.35)
      .select("id_b").as[Long].collect().toSet
    assert(dropped == pairDropped)
    // the minimum id of every label bucket always survives
    val minPerLabel = emb.groupBy("label").agg(min("vec_id").as("m"))
      .select("m").as[Long].collect().toSet
    assert(minPerLabel.subsetOf(keptIds))
  }

  // -- SpaceSaving heavy hitters ----------------------------------------

  test("spaceSaving: exact in the no-eviction regime under any partitioning") {
    import graft.functions.SpaceSavingAgg.spaceSaving
    val items = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ Seq.fill(3)("c")
    for (parts <- Seq(1, 7)) {
      val out = scala.util.Random.shuffle(items).toDF("x").repartition(parts)
        .agg(spaceSaving(col("x"), 16).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.n"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.toSet == Set(("a", 100L, 0L), ("b", 60L, 0L), ("c", 3L, 0L)))
    }
  }

  test("spaceSaving: eviction regime keeps planted heavy hitters within the n/capacity bound") {
    import graft.functions.SpaceSavingAgg.spaceSaving
    // 2 heavy items + a 200-item singleton tail, capacity 10
    val heavy = Seq.fill(1000)("hh1") ++ Seq.fill(500)("hh2")
    val tail = (1 to 200).map(i => s"t$i")
    val n = heavy.size + tail.size
    val cap = 10
    val est = (heavy ++ tail).toDF("x").repartition(4)
      .agg(spaceSaving(col("x"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // anything with true frequency > n/cap must be resident, within bounds
    val bound = n.toLong / cap
    assert(est.contains("hh1") && est.contains("hh2"))
    assert(math.abs(est("hh1") - 1000L) <= bound)
    assert(math.abs(est("hh2") - 500L) <= bound)
    // sketch never holds more than `capacity` counters
    assert(est.size <= cap)
  }

  test("q_heavy_hitters_approx emits the sketch theorems as a deterministic row") {
    val row = SparkEntry.queries("q_heavy_hitters_approx")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("n_resident") == 8L)      // capacity, vocab-certified
    assert(r.getAs[Long]("total_n") > 0L)
    assert(r.getAs[Boolean]("all_within_bound"))   // |est - true| <= n/cap
    assert(r.getAs[Boolean]("heavy_found"))        // freq > 2n/cap => resident
  }

  // -- Weighted sampling ------------------------------------------------

  test("weightedExact percentile is bit-identical to the builtin frequency form") {
    import graft.operators.Percentiles
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("price"),
        col("l_quantity").cast("long").as("qty"))
    val hist = Percentiles.weightedExact(li, Seq("l_returnflag"), "price", "qty",
        Seq(0.0, 0.25, 0.5, 0.9, 1.0), "__p")
      .select(col("l_returnflag"), col("__p"))
    val builtin = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(price, array(0.0D, 0.25D, 0.5D, 0.9D, 1.0D), qty)").as("__p"))
    assert(hist.exceptAll(builtin).count() == 0 && builtin.exceptAll(hist).count() == 0)
  }

  test("weightedSample: partitioning-invariant, excludes non-positive weights, k-bounded") {
    import graft.operators.Sampling
    val df = (1 to 500).map(i => (i.toLong, "s", if (i <= 490) 1.0 else 0.0))
      .toDF("id", "stratum", "w")
    val a = Sampling.weightedSample(df.repartition(1), "stratum", "id", "w", 20)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), "stratum", "id", "w", 20)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 20)
    assert(a.forall(_ <= 490L)) // zero-weight rows never sampled
  }

  test("weightedSample: selection probability tracks weight (heavy rows dominate)") {
    import graft.operators.Sampling
    // 100 heavy rows (w=50) vs 900 light rows (w=1): a 100-row sample
    // should be mostly heavy (E[heavy] ~ 85+; binomial tail makes < 60
    // vanishingly unlikely under correct A-ES, ~10 expected if unweighted)
    val df = (1 to 1000).map(i => (i.toLong, "s", if (i <= 100) 50.0 else 1.0))
      .toDF("id", "stratum", "w")
    val picked = Sampling.weightedSample(df, "stratum", "id", "w", 100)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ <= 100L)
    assert(heavy > 60, s"only $heavy of 100 sampled rows were heavy-weight")
  }

  // -- Robust stats -----------------------------------------------------

  test("winsorize: clipped values sit inside the group percentile bounds; inliers unchanged") {
    import graft.operators.Robust
    val df = ((1 to 98).map(i => ("g", i.toDouble)) ++ Seq(("g", 1e9), ("g", -1e9)))
      .toDF("grp", "v")
    val out = Robust.winsorize(df, "grp", "v", 0.05, 0.95).collect()
    val ws = out.map(_.getDouble(2))
    assert(ws.max < 1e9 && ws.min > -1e9)      // extremes clipped
    val mid = out.filter(r => r.getDouble(1) == 50.0)
    assert(mid.forall(r => r.getDouble(2) == 50.0)) // median row untouched
  }

  test("robustOutliers: planted outlier flagged, constant group yields null z and no flags") {
    import graft.operators.Robust
    val df = ((1 to 50).map(i => (i.toLong, "a", (i % 7).toDouble)) ++
        Seq((99L, "a", 1e6)) ++                  // planted outlier
        (1 to 10).map(i => (100L + i, "c", 5.0))) // constant group: MAD = 0
      .toDF("id", "grp", "v")
    val res = Robust.robustOutliers(df, "grp", "v", 3.5)
    val zi = res.columns.indexOf("robust_z")
    val oi = res.columns.indexOf("is_outlier")
    val out = res.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(99L).getBoolean(oi))              // outlier flagged
    assert((1 to 50).forall(i => !out(i.toLong).getBoolean(oi)))
    assert((101 to 110).forall(i => out(i.toLong).isNullAt(zi) && !out(i.toLong).getBoolean(oi)))
  }

  test("robust gates: bounds tables broadcast — the corpus side never shuffles") {
    import graft.operators.Robust
    val li = Tables.lineitem(spark, DriftQuantizeSpec.sf)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice").as("v"))
    val plan = Robust.winsorize(li, "l_returnflag", "v", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!"Exchange hashpartitioning\\(l_orderkey".r.findAllIn(plan).hasNext, plan)
  }

  // -- Intervals --------------------------------------------------------

  test("mergeOverlaps: overlap, touch, containment merge; gaps split; one exchange") {
    import graft.operators.Intervals
    val df = Seq(
      ("u", 0L, 10L), ("u", 5L, 20L),   // overlap -> one span 0-20
      ("u", 20L, 30L),                  // touching (start == max end) -> merges
      ("u", 22L, 25L),                  // contained
      ("u", 40L, 50L),                  // gap -> new span
      ("v", 0L, 1L)                     // other key untouched
    ).toDF("k", "s", "e")
    val out = Intervals.mergeOverlaps(df, "k", "s", "e")
    val u = out.filter($"k" === "u").orderBy("merge_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(u.toSeq == Seq((0L, 30L, 4L), (40L, 50L, 1L)))
    assert(out.filter($"k" === "v").count() == 1)
    val plan = Intervals.mergeOverlaps(df, "k", "s", "e")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  // -- Snapshot diff ----------------------------------------------------

  test("snapshot diff: planted add/remove/change detected; null position discriminates") {
    import graft.operators.SnapshotDiff
    val prev = Seq((1L, Option("a"), Option("x")), (2L, Option("b"), Option("y")),
      (3L, None: Option[String], Option("z"))).toDF("id", "p1", "p2")
    val next = Seq((1L, Option("a"), Option("x")),           // unchanged -> absent
      (3L, Option("z"), None: Option[String]),               // null moved -> changed
      (4L, Option("d"), Option("w"))                         // added
    ).toDF("id", "p1", "p2")
    val out = SnapshotDiff.diff(prev, next, "id", Seq("p1", "p2")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff: payload hash is boundary- and sentinel-collision-free") {
    import graft.operators.SnapshotDiff
    // ("ab","c") vs ("a","bc"): same concatenation without length
    // prefixes — must be reported changed
    val prev = Seq((1L, "ab", "c"), (2L, "null", "x"), (3L, "a", "b"))
      .toDF("id", "p1", "p2")
    val next = Seq((1L, "a", "bc"),
      (2L, null.asInstanceOf[String], "x"),   // null vs literal "null"
      (3L, "a", "b"))                   // separator char inside data
      .toDF("id", "p1", "p2")
    val out = SnapshotDiff.diff(prev, next, "id", Seq("p1", "p2")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed", 3L -> "changed"))
  }

  // -- Token entropy ----------------------------------------------------

  test("tokenEntropy: bounds and exact values on known docs") {
    val df = Seq(
      (1L, "a a a a"),          // zero entropy, one type
      (2L, "a b c d"),          // max entropy ln(4), all distinct
      (3L, "a a b b")           // ln(2)
    ).toDF("doc_id", "text")
    val rows = TextFns.tokenEntropy(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getDouble(3) == 0.0 && rows(1L).getDouble(4) == 0.25)
    assert(math.abs(rows(2L).getDouble(3) - math.log(4.0)) < 1e-6)
    assert(rows(2L).getDouble(4) == 1.0)
    assert(math.abs(rows(3L).getDouble(3) - math.log(2.0)) < 1e-6)
  }

  test("tokenEntropy: single exchange — both aggregate levels reuse the doc-id repartition") {
    val docs = Tables.documents(spark, DriftQuantizeSpec.sf)
    val plan = TextFns.tokenEntropy(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // AQE wraps the plan, so count shuffle exchanges in the rendered tree
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}

object DriftQuantizeSpec {
  val sf = "/root/testdata/sf0.001"
}
