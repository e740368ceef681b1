package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word n-grams WITH duplicates as one native expression — the
  * multiset sibling of [[WordShingles]] (which deduplicates for LSH).
  *
  * Semantically identical to the built-in composition
  *   transform(sequence(1, size(toks) - (n-1)),
  *     i -> concat_ws(' ', slice(toks, i, n)))
  * over `toks = split(text, ' ')` (single-space split keeping
  * empties), but one pass over the string: the composed form walks an
  * interpreted lambda per position and — if the token array is not
  * carefully pre-bound — re-splits the string per position (the
  * round-8 O(tokens²) trap). Short texts (< n tokens) follow
  * `shortMode`:
  *   - [[WordNgrams.ShortWhole]]: collapse to one whole-text gram
  *     (TextFns.allNgrams semantics — repetition/Gopher stats want
  *     every document represented);
  *   - [[WordNgrams.ShortEmpty]]: empty array (bigram-LM semantics —
  *     a document with no transition is absent, and an exploded empty
  *     array drops the row with no separate length filter, which would
  *     otherwise cost a second split).
  */
case class WordNgrams(child: Expression, n: Int, emptyIfShort: Boolean)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "n-gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    WordNgrams.ngrams(v.asInstanceOf[UTF8String], n, emptyIfShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordNgrams.ngrams($c, $n, $emptyIfShort)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {

  /** Static so generated code can call it directly. */
  def ngrams(text: UTF8String, n: Int, emptyIfShort: Boolean): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) {
      if (emptyIfShort) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val m = toks.length - n + 1
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Whole-text gram for short docs — TextFns.allNgrams semantics. */
  def wordNgrams(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(WordNgrams(bridge.toExpression(c), n, emptyIfShort = false))
  }

  /** Empty array for short docs — n-gram-LM semantics (exploding drops
    * the document, no length pre-filter needed).
    */
  def wordNgramsStrict(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(WordNgrams(bridge.toExpression(c), n, emptyIfShort = true))
  }
}
