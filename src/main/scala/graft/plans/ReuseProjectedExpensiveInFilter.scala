package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Cast, Expression, PredicateHelper, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Cross-operator common-subexpression reuse between a Project and the
  * Filter predicate pushdown parked beneath it.
  *
  * Pushdown substitutes a Project's aliases into predicates as it moves
  * them down, so `select(score.as("p")).filter(p > t)` optimizes into
  *   Project [score AS p]
  *   +- Filter (score > t)        -- the FULL score tree, inlined
  * and every surviving row evaluates the score expression TWICE — once
  * in the filter, once in the projection. Whole-stage codegen does not
  * eliminate subexpressions ACROSS operators, so for scan-stage score
  * batteries built on `split` (token counts, stopword ratios, logistic
  * quality scores) this doubles the dominant per-row cost
  * (q_calibration evaluated the same split tree 14x across
  * Project/Filter before this rule).
  *
  * The rewrite: for each filter conjunct containing a subtree that a
  * DIRECTLY-ENCLOSING Project already computes under an alias, replace
  * the subtree with the alias's attribute and float that conjunct
  * ABOVE the Project; conjuncts with no projected expensive subtree
  * (cheap scan predicates, pushable IsNotNulls) stay below. Reordering
  * a deterministic Filter with a deterministic Project is semantics-
  * preserving row-for-row; the only cost delta is that the projection
  * now runs on pre-filter rows — which it had to compute for the
  * filter ANYWAY, so total expensive-tree evaluations drop from
  * (1 + selectivity)·N to exactly N.
  *
  * Only expensive trees qualify (the graft custom expressions and
  * `split`-bearing chains): floating a cheap comparison above a
  * Project would trade nothing for lost pushdown. Runs in the
  * user-rules batch (after the main pushdown fixpoint, so nothing
  * re-pushes the floated conjunct). Registered via
  * [[graft.GraftExtensions]].
  */
object ReuseProjectedExpensiveInFilter extends Rule[LogicalPlan]
    with PredicateHelper {

  private def isExpensive(e: Expression): Boolean = e.exists {
    case _: StringSplit => true
    case _: graft.functions.WordShingles => true
    case _: graft.functions.WordNgrams => true
    case _: graft.functions.MinHashSig => true
    case _: graft.functions.SimHash64 => true
    case _: graft.functions.TitleCase => true
    case _: graft.functions.NfcNormalize => true
    case _: graft.functions.JaroWinkler => true
    case _: graft.functions.DotProduct => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(list, f @ Filter(cond, child))
        if cond.deterministic && list.forall(_.deterministic) =>
      // the reuse targets: each expensive alias tree maps to its output
      // attribute. When the alias is a WIDENING numeric cast of the
      // tree (the common `.cast("long")` idiom), ALSO map the inner
      // tree to a cast-back of the attribute — UnwrapCastInBinaryComparison
      // strips the widening cast from pushed predicates, so the filter
      // carries the INNER tree, and casting the attribute back down is
      // exact (attr == widen(inner) by construction)
      val aliasMap: Map[Expression, Expression] = (list.collect {
        case a: Alias if isExpensive(a.child) =>
          Seq(a.child.canonicalized -> (a.toAttribute: Expression)) ++
            (a.child match {
              case c: Cast
                  if c.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
                     c.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
                Seq(c.child.canonicalized ->
                  (Cast(a.toAttribute, c.child.dataType): Expression))
              case _ => Nil
            })
      }).flatten.toMap
      if (aliasMap.isEmpty) p
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val (floated, kept) = conjuncts.map { c =>
          val rewritten = c.transform {
            case sub if aliasMap.contains(sub.canonicalized) =>
              aliasMap(sub.canonicalized)
          }
          // float only when something was actually reused AND the
          // rewritten predicate is answerable from the Project's output
          if (!rewritten.fastEquals(c) &&
              rewritten.references.subsetOf(p.outputSet)) (Some(rewritten), None)
          else (None, Some(c))
        }.unzip match {
          case (fs, ks) => (fs.flatten, ks.flatten)
        }
        if (floated.isEmpty) p
        else {
          val below =
            if (kept.isEmpty) child
            else Filter(kept.reduce(And(_, _)), child)
          Filter(floated.reduce(And(_, _)), Project(list, below))
        }
      }
  }
}
