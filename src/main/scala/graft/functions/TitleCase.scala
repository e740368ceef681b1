package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python `str.title()` semantics as a native Catalyst expression with
  * codegen (ref: etl.py:105-117, `capitalize_udf`).
  *
  * Differs from Spark's `initcap`: Python treats EVERY non-letter as a word
  * boundary ("o'neill".title == "O'Neill", "a1b".title == "A1B"), while
  * initcap only breaks on whitespace and lowercases the rest. A plain
  * `initcap(lower(c))` misses apostrophe/digit boundaries, so exact parity
  * needs this expression.
  */
case class TitleCase(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    TitleCase.title(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TitleCase.title($c)")

  override protected def withNewChildInternal(newChild: Expression): TitleCase =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "titlecase"
}

object TitleCase {
  /** Static so generated code can call it directly. Python `str.title()`:
    * a cased character following a non-cased character is uppercased
    * (titlecased), any other cased character is lowercased; non-cased
    * characters pass through and reset the word boundary.
    */
  def title(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb  = new java.lang.StringBuilder(str.length)
    var i = 0
    var prevCased = false
    while (i < str.length) {
      val cp    = str.codePointAt(i)
      val cased = Character.isLetter(cp)
      val out =
        if (cased && !prevCased) Character.toTitleCase(cp)
        else if (cased) Character.toLowerCase(cp)
        else cp
      sb.appendCodePoint(out)
      prevCased = cased
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def titlecase(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(TitleCase(bridge.toExpression(c)))
  }
}
