package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the library's optimizer rules (registered into the
  * shared test session by GraftExtensions): shape pins on the optimized
  * plans plus result-level differentials proving the rewrites are
  * semantics-free, including around nulls.
  */
class OptimizerRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local Seq inputs fold to a bare LocalRelation under
    * ConvertToLocalRelation, which would make every plan-shape assertion
    * here vacuous — exclude it for the duration of a test body.
    */
  private def withPlansVisible[A](body: => A): A = {
    val key  = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def splitsIn(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      filtersOnly: Boolean): Int =
    plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s
        }.size
      case node if !filtersOnly =>
        node.expressions.map(_.collect {
          case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s
        }.size).sum
    }.sum

  test("SimplifyGraftNullGuards: isnotnull over a null-intolerant chain checks the input column") { withPlansVisible {
    val df = Seq(("a b c d", 1L), (null, 2L), ("x y", 3L)).toDF("text", "id")
    val guarded = df
      .select(col("id"), floor(size(split(col("text"), " ")).cast("double") / 10.0).as("b"))
      .filter(col("b").isNotNull)
    // the guard rewrites to isnotnull(text): no split survives in any Filter
    assert(splitsIn(guarded.queryExecution.optimizedPlan, filtersOnly = true) == 0,
      guarded.queryExecution.optimizedPlan.treeString)
    // and the null row is dropped exactly as before
    assert(guarded.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }}

  test("SimplifyGraftNullGuards: size(shingles)>0 inference guard folds to the input check") { withPlansVisible {
    val df = Seq(("a b c d e", 1L), (null, 2L)).toDF("text", "id")
    val exploded = df.select(col("id"),
        explode(graft.functions.WordShingles.wordShingles(lower(col("text")), 3)).as("s"))
    // InferFiltersFromGenerate wraps the generator input in size>0 +
    // isnotnull guards; both must fold away from the shingle tree
    val nShinglesInFilters = exploded.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case w: graft.functions.WordShingles => w
        }.size
    }.sum
    assert(nShinglesInFilters == 0,
      exploded.queryExecution.optimizedPlan.treeString)
    assert(exploded.count() == 3) // 3 shingles from the non-null doc
  }}

  test("ReuseProjectedExpensiveInFilter: threshold over a projected score evaluates the tree once") { withPlansVisible {
    val df = Seq(("one two three four", 1L), ("one", 2L), (null, 3L))
      .toDF("text", "id")
    val scored = df.select(col("id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 2)
    val plan = scored.queryExecution.optimizedPlan
    // exactly ONE split in the whole plan: the Filter floats above the
    // Project and compares the alias attribute (via the cast-back
    // bridge), instead of pushdown inlining a second split
    assert(splitsIn(plan, filtersOnly = false) == 1, plan.treeString)
    assert(splitsIn(plan, filtersOnly = true) == 0, plan.treeString)
    // identical rows to the unoptimized semantics (null text: split
    // nulls, comparison nulls, row dropped)
    assert(scored.select("id").as[Long].collect().toSeq == Seq(1L))
  }}

  private def withAnsi[A](on: Boolean)(body: => A): A = {
    val key  = "spark.sql.ansi.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try body finally spark.conf.set(key, prev)
  }

  test("SimplifyGraftNullGuards: (a/b) IS NOT NULL with a COLUMN divisor is left alone — zero divides to null in non-ANSI (ADVICE r9)") { withPlansVisible { withAnsi(on = false) {
    val df = Seq((10.0, 2.0), (10.0, 0.0)).toDF("a", "b")
    val q  = df.filter((col("a") / col("b")).isNotNull)
    // nullIntolerant would have claimed this rewrites to
    // isnotnull(a) AND isnotnull(b) and returned BOTH rows; division by
    // zero nulls outside ANSI, so exactly one row survives
    assert(q.count() == 1L)
    val divsInFilter = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case d: org.apache.spark.sql.catalyst.expressions.Divide => d
        }.size
    }.sum
    assert(divsInFilter >= 1, q.queryExecution.optimizedPlan.treeString)
  }}}

  test("SimplifyGraftNullGuards: overflowing decimal cast guard is left alone — narrows can null in non-ANSI (ADVICE r9)") { withPlansVisible { withAnsi(on = false) {
    val df = Seq(99999.0, 1.23).toDF("x")
    val q  = df.filter(col("x")
      .cast(org.apache.spark.sql.types.DecimalType(3, 2)).isNotNull)
    // 99999.0 overflows DECIMAL(3,2) -> null -> dropped; a
    // numeric-to-numeric blanket rule would have kept both rows
    assert(q.count() == 1L)
    val castsInFilter = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case c: org.apache.spark.sql.catalyst.expressions.Cast => c
        }.size
    }.sum
    assert(castsInFilter >= 1, q.queryExecution.optimizedPlan.treeString)
  }}}

  test("SimplifyGraftNullGuards: literal non-zero divisor still rewrites (the bucket idiom keeps its fast path)") { withPlansVisible { withAnsi(on = false) {
    // ansi off flips legacy sizeOfNull back on (size(null) = -1, which
    // keeps the null row and ALSO disables the rewrite premise) — pin
    // the modern semantics so this exercises the DivModLike literal case
    val prevSz = spark.conf.get("spark.sql.legacy.sizeOfNull")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    try {
    val df = Seq(("a b c", 1L), (null, 2L)).toDF("text", "id")
    val q = df
      .select(col("id"),
        floor(size(split(col("text"), " ")).cast("double") / 10.0).as("b"))
      .filter(col("b").isNotNull)
    assert(splitsIn(q.queryExecution.optimizedPlan, filtersOnly = true) == 0,
      q.queryExecution.optimizedPlan.treeString)
    assert(q.select("id").as[Long].collect().toSeq == Seq(1L))
    } finally spark.conf.set("spark.sql.legacy.sizeOfNull", prevSz)
  }}}

  test("ReuseProjectedExpensiveInFilter: a throwing sibling projection blocks the float (ANSI cast on pre-filter rows)") { withPlansVisible { withAnsi(on = true) {
    val df = Seq(("one two three", "7"), ("one", "oops")).toDF("text", "s")
    val q = df.select(col("s").cast("int").as("si"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 2)
    // were the Filter hoisted above the Project, CAST('oops' AS INT)
    // would evaluate on the second row and throw under ANSI; the gate
    // must keep the filter below and accept the double split
    val rows = q.collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq == Seq((7, 3L)))
    assert(splitsIn(q.queryExecution.optimizedPlan, filtersOnly = true) == 1,
      q.queryExecution.optimizedPlan.treeString)
  }}}

  test("ReuseProjectedExpensiveInFilter: alias under a conditionally-evaluated position (HOF lambda) is never exempted (ADVICE r11)") { withPlansVisible { withAnsi(on = true) {
    // dp throws on mismatched vector lengths (DotProduct). In the
    // original plan the second row never evaluates it: the pushed-down
    // filter's exists() lambda runs zero times on the empty probe array
    // and the row is dropped before the Project. Were the float's
    // exemption to treat a lambda position as unconditionally
    // evaluated (the old inverted default), the hoisted Project would
    // evaluate dp on that row and throw. The conservative whitelist
    // must refuse the float instead.
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(9.0)),
      (Seq(1.0), Seq(1.0, 2.0), Seq.empty[Double])
    ).toDF("va", "vb", "probe")
    val q = df.select(col("probe"),
        graft.functions.DotProduct.dotProduct(col("va"), col("vb")).as("dp"))
      .filter(exists(col("probe"), x => x > col("dp")))
    assert(q.select("dp").as[Double].collect().toSeq == Seq(5.0))
    // and the filter stayed below the Project (condition still carries
    // the inlined dot_product tree)
    val below = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.exists(_.isInstanceOf[graft.functions.DotProduct]) => f
    }
    assert(below.nonEmpty, q.queryExecution.optimizedPlan.treeString)
  }}}

  test("ReuseProjectedExpensiveInFilter rides ONLY the extraOptimizations path — injectOptimizerRule would be re-pushed into a no-op") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val injected =
      org.apache.spark.sql.graft.bridge.injectedOptimizerRules(ext, spark)
    assert(injected.exists(_ eq graft.plans.SimplifyGraftNullGuards))
    assert(injected.exists(_ eq graft.plans.CollapseTitleCase))
    assert(!injected.exists(_ eq graft.plans.ReuseProjectedExpensiveInFilter),
      "the class-extension path must not inject the reuse rule: inside " +
        "the operator-optimization fixpoint PushDownPredicates re-inlines " +
        "the floated conjunct")
    assert(spark.experimental.extraOptimizations
      .contains(graft.plans.ReuseProjectedExpensiveInFilter))
  }

  test("ReuseProjectedExpensiveInFilter: cheap conjuncts stay below the Project for pushdown") { withPlansVisible {
    val df = Seq(("one two three", 1L, "en"), ("uno dos", 2L, null))
      .toDF("text", "id", "lang")
    val scored = df.select(col("id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 2 && col("lang").isNotNull)
    val plan = scored.queryExecution.optimizedPlan
    assert(splitsIn(plan, filtersOnly = false) == 1, plan.treeString)
    // the lang guard must remain in a Filter BELOW the Project — pushdown
    // rewrites it against the pre-alias attribute, so match on shape: an
    // isnotnull conjunct with no split in the condition
    val belowFilters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.collect {
            case n: org.apache.spark.sql.catalyst.expressions.IsNotNull => n
          }.nonEmpty && f.condition.collect {
            case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s
          }.isEmpty => f
    }
    assert(belowFilters.nonEmpty, plan.treeString)
    assert(scored.select("id").as[Long].collect().toSeq == Seq(1L))
  }}
}
