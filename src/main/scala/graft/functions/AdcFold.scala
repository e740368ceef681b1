package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The ADC distance fold — `sum over s of lut[s][codes[s]]` for a PQ
  * codes column (`array<int>`, one code per subspace) against a
  * lookup-table column (`array<array<double>>`, the per-subspace
  * partial squared distances of a probe vector to every codebook
  * centroid) — as a native codegen'd expression.
  *
  * Replaces `aggregate(zip_with(codes, lut, (c, t) => element_at(t, c + 1)),
  * 0.0, _ + _)`: higher-order functions are CodegenFallback
  * (interpreted, boxing every element, allocating the zipped struct
  * array PER PAIR) — measured at ~9 s/batch of pure interpreter
  * overhead plus GC-feedback blowup in the coded gate's coarse phase,
  * where this fold runs once per (probe, candidate) pair. The float
  * path's per-pair cosine is the codegen'd [[DotProduct]] for exactly
  * the same reason; this is its ADC sibling. Summation order is
  * ascending-subspace from +0.0 — bit-identical to the interpreted
  * fold and to [[graft.similarity.Pq]]'s driver-side table build.
  */
case class AdcFold(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))

  override def nullSafeEval(codes: Any, lut: Any): Any =
    AdcFold.fold(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.AdcFold.fold($c, $l)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcFold =
    copy(left = newLeft, right = newRight)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "adc_fold"
}

object AdcFold {

  /** Static so generated code calls it directly. A subspace-count
    * mismatch or an out-of-range code throws with the shape — silent
    * truncation would corrupt every distance downstream (the
    * [[DotProduct.dot]] fail-fast rationale).
    */
  def fold(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    if (m != lut.numElements())
      throw new IllegalArgumentException(
        s"adc_fold: ${m} codes vs ${lut.numElements()} lookup rows — " +
          "codes and table must share the subspace count")
    var acc = 0.0
    var s = 0
    while (s < m) {
      val row = lut.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements())
        throw new IllegalArgumentException(
          s"adc_fold: code $c out of range [0, ${row.numElements()}) " +
            s"at subspace $s — codes encoded under a different codebook?")
      acc += row.getDouble(c)
      s += 1
    }
    acc
  }

  def adcFold(codes: Column, lut: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(AdcFold(bridge.toExpression(codes), bridge.toExpression(lut)))
  }
}
