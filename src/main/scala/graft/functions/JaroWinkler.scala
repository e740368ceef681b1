package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen expression — the
  * standard entity-resolution complement to edit distance (levenshtein
  * penalizes transpositions hard; names and titles are full of them).
  *
  * Classic Winkler variant, matched to common implementations (and to
  * the DuckDB oracle's `jaro_winkler_similarity`) so scores are
  * engine-portable: case-sensitive over Unicode code points; match
  * window ⌊max(|a|,|b|)/2⌋−1; similarity 0.0 when either side is empty
  * (including both); prefix boost j + ℓ·0.1·(1−j) with ℓ = common
  * prefix capped at 4, applied only when jaro > 0.7.
  *
  * O(|a|·|b|) worst case per pair — a VERIFIER for candidate pairs from
  * a banding generator ([[graft.operators.FuzzyJoin]], LSH buckets),
  * never a pair generator itself.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.sim($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  final val PrefixScale = 0.1
  final val PrefixCap = 4
  final val BoostThreshold = 0.7

  /** Static so generated code can call it directly. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString.codePoints().toArray
    val s2 = b.toString.codePoints().toArray
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched code points compared in order
    var halfT = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = ⌊half-transpositions / 2⌋ (integer, matching
    // rapidfuzz-style implementations and the DuckDB oracle)
    val j = (m / n1 + m / n2 + (m - (halfT / 2)) / m) / 3.0
    if (j <= BoostThreshold) return j
    var l = 0
    while (l < math.min(math.min(n1, n2), PrefixCap) && s1(l) == s2(l)) l += 1
    j + l * PrefixScale * (1.0 - j)
  }

  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(JaroWinkler(bridge.toExpression(a), bridge.toExpression(b)))
  }
}
