package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as ONE scan-stage
  * expression — signature-identical to the aggregate formulation
  * (explode tokens → xxhash64 → per-bit ±1 votes → sign), because it
  * hashes each token with the same XXH64/seed-42 function Spark's
  * `xxhash64` uses and applies the same `votes > 0` collapse.
  *
  * The scale win is structural, not constant-factor: the aggregate
  * form shuffles one vote buffer per (doc, partition) to regroup by
  * doc id; this expression computes the signature where the row
  * already is — ZERO exchange for the signature stage at any corpus
  * size, so simhash dedup's only shuffle is the banded candidate join.
  * The aggregate ([[graft.dedup.Dedup.simhashViaAgg]]) and 64-column
  * ([[graft.dedup.Dedup.simhashViaColumns]]) forms survive as the
  * spec's differential references.
  *
  * Tokenization matches `split(text, " ")` with limit −1 (single-space
  * split, empty tokens kept — including the one empty token of an
  * empty string).
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    SimHash64.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Static so generated code can call it directly. */
  def simhash(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val u = UTF8String.fromString(toks(t))
      val h = XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(SimHash64(bridge.toExpression(c)))
  }
}
