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
