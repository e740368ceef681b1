package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, BinaryArithmetic, BinaryComparison, Cast, Coalesce, Concat, DivModLike, Expression, IsNotNull, IsNull, Length, Literal, Lower, Not, Or, PredicateHelper, RoundBase, Size, StringSplit, StringTrim, StringTrimLeft, StringTrimRight, Substring, Upper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

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
  * Project would trade nothing for lost pushdown.
  *
  * Two registration/soundness constraints (ADVICE r9):
  *   - MUST run after the FINAL pushdown: registered ONLY via
  *     `GraftExtensions.register` into SparkOptimizer's trailing
  *     "User Provided Optimizers" batch. `injectOptimizerRule` would
  *     place it inside the operator-optimization fixpoint, where the
  *     next PushDownPredicates pass re-inlines the floated conjunct —
  *     a silent no-op (the class-extension path deliberately omits it).
  *   - Hoisting the Filter above the Project makes EVERY projection
  *     expression run on pre-filter rows. Values of the extra rows are
  *     discarded, so that is semantics-free — UNLESS a projection
  *     expression can THROW (ANSI overflow/div-zero, malformed cast) on
  *     a row the predicate used to filter out first. The rewrite
  *     therefore only fires when every projection expression is
  *     provably non-throwing ([[neverThrows]]); otherwise the plan is
  *     left alone and the row pays the double evaluation — correctness
  *     over speed.
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

  /** Conservative per-node proof that an expression tree cannot throw at
    * RUNTIME in any eval mode (ANSI included): pure string/array ops,
    * double/float arithmetic (overflows to ±Inf, never errors — unlike
    * integral/decimal, which throw under ANSI), widening casts
    * (`Cast.canUpCast` — no overflow, no parse), and the graft scalar
    * expressions EXCEPT DotProduct (throws on mismatched array lengths,
    * DotProduct.scala:57). Division is admitted only with a non-zero
    * literal divisor at double/float type. Anything unrecognized —
    * integral arithmetic, narrowing/parsing casts, log of a column,
    * array indexing — fails the proof and blocks the float.
    */
  private def neverThrows(e: Expression): Boolean = {
    def fractional(x: Expression): Boolean =
      x.dataType == DoubleType || x.dataType == FloatType
    def nodeOk(x: Expression): Boolean = x match {
      case _: Attribute | _: Literal | _: Alias => true
      case _: graft.functions.DotProduct => false
      case _ if x.getClass.getName.startsWith("graft.functions.") => true
      case _: StringSplit | _: Size | _: Length | _: Lower | _: Upper
         | _: Concat | _: Substring | _: StringTrim | _: StringTrimLeft
         | _: StringTrimRight => true
      case _: BinaryComparison | _: And | _: Or | _: Not
         | _: IsNull | _: IsNotNull | _: Coalesce => true
      case _: org.apache.spark.sql.catalyst.expressions.CaseWhen
         | _: org.apache.spark.sql.catalyst.expressions.If => true
      case c: Cast => Cast.canUpCast(c.child.dataType, c.dataType)
      case r: RoundBase => fractional(r.children.head)
      case d: DivModLike =>
        fractional(d) && (d.right match {
          case Literal(n: java.lang.Number, _) => n.doubleValue() != 0.0
          case _ => false
        })
      case b: BinaryArithmetic => fractional(b) // +,-,* on double/float
      case _: org.apache.spark.sql.catalyst.expressions.Sqrt
         | _: org.apache.spark.sql.catalyst.expressions.Exp => true
      case u: org.apache.spark.sql.catalyst.expressions.UnaryMinus =>
        fractional(u)
      case a: org.apache.spark.sql.catalyst.expressions.Abs =>
        fractional(a)
      case _ => false
    }
    !e.exists(n => !nodeOk(n))
  }

  /** Whether `target` sits in a position of `root` that is evaluated on
    * EVERY row `root` is evaluated on. Branching/short-circuiting nodes
    * (And/Or/If/CaseWhen/Coalesce) unconditionally evaluate only their
    * first child (left operand / predicate / first branch condition).
    * For other nodes the default is INVERTED (ADVICE r11): only node
    * classes PROVEN to evaluate all children whenever they evaluate —
    * plain scalar computation with no skipping semantics — recurse into
    * every child; anything unrecognized (NaNvl's fallback arm, In's
    * short-circuited list, a higher-order function whose lambda may run
    * zero times on an empty array, ...) conservatively answers false,
    * and the alias must then pass the neverThrows proof instead.
    */
  private def unconditionallyEvaluated(
      root: Expression, target: Attribute): Boolean = {
    def walk(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(target)
      case _: And | _: Or | _: Coalesce
         | _: org.apache.spark.sql.catalyst.expressions.If
         | _: org.apache.spark.sql.catalyst.expressions.CaseWhen =>
        e.children.headOption.exists(walk)
      case _: BinaryComparison | _: BinaryArithmetic | _: Not
         | _: IsNull | _: IsNotNull | _: Cast | _: Alias
         | _: StringSplit | _: Size | _: Length | _: Lower | _: Upper
         | _: Concat | _: Substring | _: StringTrim | _: StringTrimLeft
         | _: StringTrimRight | _: RoundBase
         | _: org.apache.spark.sql.catalyst.expressions.UnaryMinus
         | _: org.apache.spark.sql.catalyst.expressions.Abs
         | _: org.apache.spark.sql.catalyst.expressions.Sqrt
         | _: org.apache.spark.sql.catalyst.expressions.Exp =>
        e.children.exists(walk)
      case _ if e.getClass.getName.startsWith("graft.functions.") =>
        // graft scalar expressions are strict unary/binary evals
        e.children.exists(walk)
      case _ => false
    }
    walk(root)
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
              // cast-back entries only for WIDENING casts: the alias
              // tree's own Cast was never in the filter (only its inner
              // tree was), so when the exemption below credits the
              // alias as "already evaluated", the Cast wrapper must be
              // provably non-throwing on its own — canUpCast cannot
              // overflow or fail to parse (ADVICE r10)
              case c: Cast if Cast.canUpCast(c.child.dataType, c.dataType) =>
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
          // New-throw gate: the hoisted Filter makes every projection
          // expression run on pre-filter rows. An alias may be exempt
          // from the neverThrows proof only when its tree was ALREADY
          // evaluated on every pre-filter row in the ORIGINAL plan —
          // and And short-circuits, so of the floated conjuncts only
          // the FIRST (in original conjunct order) is guaranteed to
          // have run on every row reaching the Project (rows there
          // passed all kept conjuncts, a subset of the rows on which
          // the first floated conjunct — preceded only by kept
          // conjuncts — was evaluated; a LATER floated conjunct was
          // skipped whenever an earlier one failed, ADVICE r10).
          // Within that first conjunct the attribute must sit in an
          // unconditionally-evaluated position (not under the
          // short-circuited arm of an Or/If/CaseWhen/Coalesce). Every
          // other projection item must be provably non-throwing, or we
          // leave the plan alone (double evaluation is the safe cost).
          val exemptRefs = org.apache.spark.sql.catalyst.expressions
            .AttributeSet(floated.head.references.filter(a =>
              unconditionallyEvaluated(floated.head, a)))
          val safe = list.forall { ne =>
            exemptRefs.contains(ne.toAttribute) || neverThrows(ne)
          }
          if (!safe) p
          else {
            val below =
              if (kept.isEmpty) child
              else Filter(kept.reduce(And(_, _)), child)
            Filter(floated.reduce(And(_, _)), Project(list, below))
          }
        }
      }
  }
}
