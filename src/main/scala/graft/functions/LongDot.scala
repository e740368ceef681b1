package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two array<long> columns as a native codegen'd
  * expression — the fixed-point twin of [[DotProduct]].
  *
  * Replaces `aggregate(zip_with(xl, wl, _*_), 0L, _+_)` — the margin /
  * projection fold of every fixed-point model in the repo (LogReg,
  * Poisson, JL projection, power-iteration scoring): higher-order
  * functions are CodegenFallback, so the interpreted fold boxes every
  * element and allocates the zipped array on every row (and inside
  * per-iteration training loops, on every row per iteration).
  *
  * Value semantics MIRROR the fold it replaces under the sessions'
  * actual configuration: a length mismatch (zip_with pads with null →
  * null product → null sum) or a null element (null poisons the fold's
  * accumulator) yields NULL, and — because Spark 4 defaults
  * `spark.sql.ansi.enabled=true` and no session here turns it off —
  * the fold's Multiply/Add FAIL FAST on long overflow, so this does
  * too (`Math.multiplyExact`/`addExact`; the exception class matches
  * ANSI's ArithmeticException, the message differs). In-range inputs
  * are bit-identical regardless: exact integer sums are
  * association-free, and the accumulation is ascending-index anyway.
  * Fixed-point callers stay orders of magnitude inside the bound
  * (quantized features ≤ 1e8, weights ≤ ~1e6-grid magnitudes → |Σ|
  * ≲ 1e16 at dim 65).
  */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("longDotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long $res = graft.functions.LongDot.dot($a, $b);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_dot"
}

object LongDot {

  /** Static so generated code calls it directly. Boxed return carries
    * the null verdict (length mismatch or null element — the zip_with
    * fold's semantics); the loop itself runs on primitive longs, with
    * exact multiply/add preserving the replaced fold's ANSI fail-fast
    * on overflow (both are JIT intrinsics — no cost at fixed-point
    * magnitudes).
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def longDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(LongDot(bridge.toExpression(a), bridge.toExpression(b)))
  }
}
