package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM Viterbi DP — min-cost decomposition of a marked word
  * under a fixed symbol-cost table — as a native codegen'd expression
  * returning the final-position cost.
  *
  * Replaces [[graft.text.UnigramLm.viterbiSegment]]'s
  * `aggregate(sequence(1, n), array(0.0), (bst, i) => concat(bst,
  * array(array_min(transform(sequence(0, i-1), j => bst[j+1] +
  * coalesce(costMap[substr], 1e18))))))` body: nested higher-order
  * functions are CodegenFallback — interpreted, boxing every candidate,
  * and the per-position `concat(bst, array(...))` reallocates the
  * growing best-array O(n) times (O(n²) copying on top of the O(n²) DP)
  * — where this is one primitive-double DP loop per row (the
  * [[CentroidDists]] playbook applied to the segmentation face).
  *
  * Bit-identical to the interpreted form: positions run ascending
  * exactly like `aggregate`'s fold; per candidate ONE IEEE addition
  * `best(j) + cost` with the identical operands (absent symbols cost
  * the same 1e18 the `coalesce` supplied); the min tracks
  * `array_min`'s ordering (java.lang.Double.compare, first winner kept
  * on ties — plain `<` for the all-finite sums here, stated for
  * exactness). Positions index CODE POINTS like Catalyst `substring`/
  * `length`, not UTF-16 units. A NULL input yields NULL, exactly as
  * the old expression tree null-propagated it.
  */
case class ViterbiCost(child: Expression, costs: Map[String, Double])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(StringType)

  // one lookup table per expression instance, shared across rows (and
  // shipped by reference into generated code)
  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](costs.size * 2)
    costs.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  override def nullSafeEval(wx: Any): Any =
    ViterbiCost.cost(wx.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("viterbiCosts", table,
      "java.util.HashMap<String, Double>")
    defineCodeGen(ctx, ev,
      wx => s"graft.functions.ViterbiCost.cost($wx, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiCost =
    copy(child = newChild)

  override def prettyName: String = "viterbi_cost"
}

object ViterbiCost {

  private val Absent = 1e18

  /** Static so generated code calls it directly: best(n) of the
    * ascending-position DP best(i) = min_j best(j) + cost(w[j..i)),
    * with j, i over code-point positions.
    */
  def cost(wx: UTF8String, costs: java.util.HashMap[String, java.lang.Double]): Double = {
    val s = wx.toString
    // code-point array: DP positions must match Catalyst substring/length
    // semantics (code points), not Java's UTF-16 units
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    val n = cps.length
    val best = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      var m = Double.NaN
      var first = true
      var j = 0
      while (j < i) {
        val key = new String(cps, j, i - j)
        val c = costs.get(key)
        val cand = best(j) + (if (c == null) Absent else c.doubleValue())
        if (first || java.lang.Double.compare(cand, m) < 0) { m = cand; first = false }
        j += 1
      }
      best(i) = m
      i += 1
    }
    best(n)
  }

  def viterbiCost(wx: Column, costs: Map[String, Double]): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(ViterbiCost(bridge.toExpression(wx), costs))
  }
}
