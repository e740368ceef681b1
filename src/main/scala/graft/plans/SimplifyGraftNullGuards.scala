package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, GreaterThan, IsNotNull, Literal, RoundBase, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{MinHashSig, WordShingles}

/** Null/emptiness guards over computed expressions are provably
  * equivalent to guards over their INPUT COLUMNS — and Catalyst
  * manufactures exactly such guards: `InferFiltersFromGenerate` wraps
  * `explode(word_shingles(text))` in
  * `size(word_shingles(text)) > 0 AND isnotnull(word_shingles(text))`,
  * join-key constraint inference emits
  * `isnotnull(floor(cast(size(split(text)))/10.0))` for a computed
  * bucket key, and predicate pushdown then parks those Filters below
  * the Projects — so every row pays the FULL computation once in the
  * filter and again in the projection (2-3x the scan-stage cost on the
  * signature/shingle builders; caught by the PlansSpec
  * expensive-expression Filter sweep).
  *
  * The algebra that makes the rewrite exact, not heuristic:
  *   - `isnotnull(E)` ⟺ `AND(isnotnull(a) for a in E.references)`
  *     whenever EVERY node of E is null-intolerant (null out iff some
  *     input null) and every literal in E is non-null. Catalyst's own
  *     `nullIntolerant` flag drives the check — the same flag its
  *     constraint inference trusts in the other direction — plus
  *     `RoundBase`, which is behaviorally null-intolerant but ships
  *     with the conservative default flag. The graft expressions all
  *     advertise the flag themselves.
  *   - `size(E) > 0` ⟺ `isnotnull(E)` when E can never be an EMPTY
  *     array for non-null input: [[WordShingles]] and [[MinHashSig]]
  *     (short docs collapse to one whole-text shingle; signatures are
  *     fixed-length k), and `split(str, re, -1)` (Java split with a
  *     negative limit always yields >= 1 element). WordNgrams with
  *     emptyIfShort CAN be empty — its size guard is semantics and is
  *     left alone.
  *
  * Runs in the user-rules batch (after inference + pushdown), so it
  * rewrites the guards wherever they ended up. Registered via
  * [[graft.GraftExtensions]].
  */
object SimplifyGraftNullGuards extends Rule[LogicalPlan] {

  /** Every node null-intolerant, every literal non-null — the premise
    * under which E is null iff one of its attribute inputs is null.
    */
  private def nullIntolerantTree(e: Expression): Boolean = e match {
    case _: Attribute => true
    case l: Literal => l.value != null
    // behaviorally null-intolerant; ships with the default flag unset
    case r: RoundBase => r.children.forall(nullIntolerantTree)
    // Cast's flag is conservatively false (a malformed string cast CAN
    // null under non-ANSI); numeric-to-numeric casts never null a
    // non-null value in any mode
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if c.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
           c.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      nullIntolerantTree(c.child)
    // size is null-intolerant exactly when legacySizeOfNull (-1 for
    // null input) is off — the expression records its own mode
    case s: Size if !s.legacySizeOfNull => nullIntolerantTree(s.child)
    case x => x.nullIntolerant && x.children.forall(nullIntolerantTree)
  }

  /** `isnotnull(E)` as the conjunction of input-column null checks, or
    * None when the premise doesn't hold (or E has no inputs — constant
    * folding owns that case).
    */
  private def asInputNullChecks(e: Expression): Option[Expression] = {
    val refs = e.references.toSeq
    if (refs.nonEmpty && nullIntolerantTree(e))
      Some(refs.map(a => IsNotNull(a): Expression).reduce(And(_, _)))
    else None
  }

  private def neverEmptyArray(e: Expression): Boolean = e match {
    case _: WordShingles | _: MinHashSig => true
    case StringSplit(_, _, limit) if limit.foldable =>
      limit.eval() match {
        case i: java.lang.Integer => i.intValue() < 0
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(s: Size, Literal(0, IntegerType))
          if neverEmptyArray(s.child) =>
        asInputNullChecks(s.child).getOrElse(IsNotNull(s.child))
      case inn @ IsNotNull(e) if !e.isInstanceOf[Attribute] =>
        asInputNullChecks(e).getOrElse(inn)
    }
}
