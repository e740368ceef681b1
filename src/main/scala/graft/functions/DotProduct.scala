package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two array<double> columns as a native codegen'd
  * expression.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: higher-order
  * functions are CodegenFallback (interpreted, boxing every element and
  * allocating the zipped array); this is a primitive loop over the two
  * ArrayData buffers. Summation order is ascending-index, identical to
  * the fold and to DuckDB's list_dot_product — bit-identical results.
  *
  * Norms and squared distances derive from it: |a|^2 = dot(a,a),
  * |a-b|^2 = dot(a,a) - 2 dot(a,b) + dot(b,b).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "dot_product"
}

object DotProduct {

  /** Static so generated code can call it directly. Length mismatch
    * throws — the composed `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
    * form yields NULL there (zip_with pads the shorter side with nulls);
    * a silent truncated partial sum would hide malformed input, and a
    * nullable result would cost the codegen null-check on every row, so
    * fail-fast is the deliberate choice for a fixed-dim embedding column.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product requires equal-length arrays, got $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(DotProduct(bridge.toExpression(a), bridge.toExpression(b)))
  }
}
