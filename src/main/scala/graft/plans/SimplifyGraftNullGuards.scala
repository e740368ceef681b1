package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, IsNotNull, Length, Literal, Lower, Size, StringSplit, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{MinHashSig, NfcNormalize, PolyHash, SimHash64, TitleCase, WordNgrams, WordShingles}

/** Null/emptiness guards over the library's expensive expressions are
  * provably equivalent to guards over their INPUTS — and Catalyst
  * manufactures exactly such guards: `InferFiltersFromGenerate` wraps
  * `explode(word_shingles(text))` in
  * `size(word_shingles(text)) > 0 AND isnotnull(word_shingles(text))`,
  * and predicate pushdown then parks that Filter below the Project —
  * so every row pays the FULL shingle build once in the filter and
  * again in the projection (2-3x the scan-stage cost; caught by the
  * PlansSpec expensive-expression Filter sweep).
  *
  * The algebra that makes stripping safe, not heuristic:
  *   - every expression here is null-intolerant (UnaryExpression
  *     default eval): `isnotnull(f(x))` ⟺ `isnotnull(x)`;
  *   - [[WordShingles]] and [[MinHashSig]] NEVER return an empty array
  *     for non-null input (short docs collapse to one whole-text
  *     shingle; signatures are fixed-length k):
  *     `size(f(x)) > 0` ⟺ `isnotnull(x)`.
  *     ([[WordNgrams]] with emptyIfShort CAN be empty — its size guard
  *     is semantics and is left alone.)
  *
  * Runs in the user-rules batch (after inference + pushdown), so it
  * rewrites the guards wherever they ended up. Registered via
  * [[graft.GraftExtensions]].
  */
object SimplifyGraftNullGuards extends Rule[LogicalPlan] {

  /** Peel null-intolerant wrappers down to the cheapest equivalent
    * null-check target.
    */
  @annotation.tailrec
  private def strip(e: Expression): Expression = e match {
    case WordShingles(c, _) => strip(c)
    case WordNgrams(c, _, _) => strip(c)
    case MinHashSig(c, _) => strip(c)
    case SimHash64(c) => strip(c)
    case TitleCase(c) => strip(c)
    case NfcNormalize(c) => strip(c)
    case PolyHash(c) => strip(c)
    case Lower(c) => strip(c)
    case Upper(c) => strip(c)
    case Length(c) => strip(c)
    // builtins that are null-intolerant in EVERY SQL mode (ANSI on or
    // off): size(x) is null iff x is null (Spark 4 default
    // legacySizeOfNull=false), and split's null-ness depends only on
    // the string when regex/limit are non-null literals
    case s: Size => strip(s.child)
    case StringSplit(str, regex, limit)
        if regex.foldable && regex.eval() != null &&
           limit.foldable && limit.eval() != null => strip(str)
    // numeric-to-numeric casts never null a non-null value in any mode
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if c.child.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
           c.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
      strip(c.child)
    case f: org.apache.spark.sql.catalyst.expressions.Floor => strip(f.child)
    case f: org.apache.spark.sql.catalyst.expressions.Ceil => strip(f.child)
    // division by a non-zero literal: null iff the numerator is null
    // (ANSI mode throws on /0 rather than nulling, but the non-zero
    // guard keeps the rewrite valid in BOTH modes)
    case d: org.apache.spark.sql.catalyst.expressions.Divide
        if d.right.foldable && (d.right.eval() match {
          case n: java.lang.Number => n.doubleValue() != 0.0
          case dec: org.apache.spark.sql.types.Decimal => !dec.isZero
          case _ => false
        }) => strip(d.left)
    case _ => e
  }

  private def neverEmptyArray(e: Expression): Boolean = e match {
    case _: WordShingles | _: MinHashSig => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(s: Size, Literal(0, IntegerType))
          if neverEmptyArray(s.child) =>
        IsNotNull(strip(s.child))
      case inn @ IsNotNull(e) =>
        val st = strip(e)
        if (st.fastEquals(e)) inn else IsNotNull(st)
    }
}
