package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.TitleCase

/** Optimizer rule for the library's titlecase expression:
  *
  *   - `titlecase(titlecase(x))` -> `titlecase(x)` (idempotent)
  *   - `titlecase(lower(x))`     -> `titlecase(x)` (title() ignores the
  *     input's case entirely: the first cased char of each word is
  *     uppercased and the rest lowercased, so a prior lower() is dead
  *     work — and the reference's capitalize pattern at etl.py:389 is
  *     exactly `capitalize(lower(x))`)
  *
  * Injected via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object CollapseTitleCase extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case TitleCase(inner @ TitleCase(_)) => inner
    case TitleCase(Lower(c))             => TitleCase(c)
  }
}
