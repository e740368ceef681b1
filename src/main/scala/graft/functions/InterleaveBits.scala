package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) code of two dimensions: interleaves the low 32 bits
  * of each input into one long sort key. Sorting/range-partitioning by
  * this key clusters rows that are close in BOTH dimensions into the same
  * files, so a 2-D box predicate touches a handful of files instead of
  * all of them (parquet min/max footer stats only help when the layout is
  * clustered — one-dimensional sort only clusters its own column).
  * Codegen'd: two static-call instructions per row in the write path.
  */
case class InterleaveBits(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.InterleaveBits.morton($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "interleave_bits"
}

object InterleaveBits {

  /** Spread the low 32 bits of `v` into the even bit positions of a long
    * (the standard Morton magic-number spread).
    */
  private def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Static so generated code can call it directly: a's bits land in even
    * positions, b's in odd.
    */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def interleaveBits(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(InterleaveBits(bridge.toExpression(a), bridge.toExpression(b)))
  }
}
