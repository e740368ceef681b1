package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * canonicalization step a multilingual corpus needs before exact dedup
  * or fingerprinting: "é" composed (U+00E9) and decomposed (e + U+0301)
  * are different byte strings (different md5, different shingles) but the
  * same text; normalizing first makes content hashing mean what it says.
  * Spark ships no normalization builtin, and a Scala UDF here would box
  * every row — this is the same codegen shape as TitleCase.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Static so generated code can call it directly. Already-normalized
    * strings (the overwhelmingly common case) short-circuit on the
    * quick-check without allocating.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(NfcNormalize(bridge.toExpression(c)))
  }
}
