package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as one native expression.
  *
  * Semantically identical to the built-in composition
  *   array_distinct(transform(sequence(...), i -> concat_ws(' ',
  *     slice(split(text, ' '), i, n))))
  * (single-space split keeping empties; texts shorter than n words
  * collapse to one whole-text shingle; first-occurrence order), but built
  * in a single pass over the string — the composed form walks the token
  * array once per shingle through four interpreted higher-order
  * functions, and dominated the dedup pipeline's profile.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    WordShingles.shingle(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  /** Static so generated code can call it directly. */
  def shingle(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  def wordShingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(WordShingles(bridge.toExpression(c), n))
  }
}
