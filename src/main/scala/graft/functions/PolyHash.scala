package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial fingerprint of a string: h = (h * 31 + codepoint)
  * mod 1e9+7, over unicode codepoints. Deterministic, dialect-portable
  * (expressible in ANSI-ish SQL for the DuckDB oracle), codegen'd.
  *
  * Used for cheap document fingerprinting in the text-analysis pipeline —
  * an order-sensitive content hash that, unlike md5, is incrementally
  * computable and cheap to band into buckets.
  */
case class PolyHash(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "poly_hash"
}

object PolyHash {
  final val Mod = 1000000007L

  /** Static so generated code can call it directly. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def polyHash(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(PolyHash(bridge.toExpression(c)))
  }
}
