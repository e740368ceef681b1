package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Attribute, And, BinaryArithmetic, BitwiseAnd, BitwiseNot, BitwiseOr, BitwiseXor, Cast, Ceil, Concat, DivModLike, EvalMode, Expression, Floor, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Length, Literal, Lower, Multiply, RoundBase, Size, StringSplit, StringTrim, StringTrimLeft, StringTrimRight, Substring, Subtract, UnaryMinus, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, IntegerType, NumericType}

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
  *     whenever EVERY node of E is TOTAL FOR NON-NULL INPUTS — i.e.
  *     null out iff some input is null, AND never null for non-null
  *     inputs in ANY eval mode. Catalyst's `nullIntolerant` flag alone
  *     is NOT that premise: it only promises null-in → null-out.
  *     Divide/Remainder/Pmod inherit nullIntolerant=true yet return
  *     null on a zero divisor outside ANSI mode, and a numeric cast to
  *     a narrow decimal nulls on overflow outside ANSI mode. So the
  *     check is an explicit WHITELIST of expressions proven total
  *     (graft scalar expressions, string/size/compare ops, arithmetic
  *     at non-decimal types under non-TRY eval — decimal +,-,*,/ null
  *     on precision overflow in LEGACY mode and EvalMode.TRY nulls on
  *     integral overflow — and up-casts), with DivModLike admitted
  *     only under a non-null non-zero LITERAL divisor and Cast only
  *     when `Cast.canUpCast` (widening, cannot overflow) holds.
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

  /** Structural whitelist: expression CLASSES that never produce null
    * from non-null inputs in any eval mode (they may throw under ANSI —
    * wrap-vs-throw does not affect null-equivalence). Children are
    * checked recursively by [[totalForNonNull]].
    */
  private def whitelistedNode(e: Expression): Boolean = e match {
    // graft scalar expressions: all total by construction (audited:
    // none of the nullSafeEvals can return null)
    case _ if e.getClass.getName.startsWith("graft.functions.") => true
    // unary arithmetic: neg/abs of a value within a type's range stays
    // within its range (decimal included), so wraps or throws, never
    // nulls; a TRY wrapper would surface as a TryEval node, which is
    // not whitelisted
    case _: UnaryMinus | _: Abs => true
    case _: Floor | _: Ceil => true
    case _: BitwiseAnd | _: BitwiseOr | _: BitwiseXor | _: BitwiseNot => true
    // string ops: total for non-null inputs
    case _: Length | _: Lower | _: Upper | _: Concat | _: Substring => true
    case _: StringTrim | _: StringTrimLeft | _: StringTrimRight => true
    case _: StringSplit => true
    // comparisons over non-null operands are two-valued
    case _: GreaterThan | _: GreaterThanOrEqual
       | _: LessThan | _: LessThanOrEqual => true
    case _ => false
  }

  /** Every node proven total for non-null inputs, every literal
    * non-null — the premise under which E is null iff one of its
    * attribute inputs is null. NOT `x.nullIntolerant`: that flag admits
    * DivModLike (null on zero divisor, non-ANSI) and would make the
    * rewrite return wrong rows (ADVICE r9, reproduced on (10,0)).
    */
  private def totalForNonNull(e: Expression): Boolean = e match {
    case _: Attribute => true
    case l: Literal => l.value != null
    // behaviorally null-intolerant and total; ships with the
    // conservative default flag unset
    case r: RoundBase => r.children.forall(totalForNonNull)
    // Cast: only WIDENING casts that cannot overflow. Numeric-to-numeric
    // is not enough — a non-ANSI overflow into DecimalType returns null
    // (ADVICE r9, reproduced with CAST(99999.0 AS DECIMAL(3,2))).
    case c: Cast if Cast.canUpCast(c.child.dataType, c.dataType) =>
      totalForNonNull(c.child)
    // size is null-intolerant exactly when legacySizeOfNull (-1 for
    // null input) is off — the expression records its own mode
    case s: Size if !s.legacySizeOfNull => totalForNonNull(s.child)
    // binary arithmetic: total only at NON-DECIMAL result types under
    // non-TRY eval — decimal +,-,*,/ return null on precision overflow
    // in LEGACY mode, and EvalMode.TRY (try_add/try_multiply/...)
    // returns null on integral overflow (ADVICE r10). Non-decimal
    // LEGACY/ANSI wraps or throws, never nulls.
    case b @ (_: Add | _: Subtract | _: Multiply) =>
      val ba = b.asInstanceOf[BinaryArithmetic]
      ba.evalMode != EvalMode.TRY &&
        !ba.dataType.isInstanceOf[DecimalType] &&
        ba.children.forall(totalForNonNull)
    // division family: the same type/mode restriction, plus a non-null
    // non-zero LITERAL divisor (the computed-bucket `x / 10.0` idiom);
    // a column divisor can be zero → null in non-ANSI/TRY modes, and a
    // decimal quotient can null on precision overflow even with a
    // non-zero literal divisor
    case d: DivModLike
        if d.evalMode != EvalMode.TRY &&
          !d.dataType.isInstanceOf[DecimalType] =>
      d.children match {
        case Seq(left, Literal(v, _: NumericType)) =>
          (v match {
            case n: java.lang.Number => n.doubleValue() != 0.0
            case dec: org.apache.spark.sql.types.Decimal => !dec.isZero
            case _ => false
          }) && totalForNonNull(left)
        case _ => false
      }
    case x if whitelistedNode(x) => x.children.forall(totalForNonNull)
    case _ => false
  }

  /** `isnotnull(E)` as the conjunction of input-column null checks, or
    * None when the premise doesn't hold (or E has no inputs — constant
    * folding owns that case).
    */
  private def asInputNullChecks(e: Expression): Option[Expression] = {
    val refs = e.references.toSeq
    if (refs.nonEmpty && totalForNonNull(e))
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
