package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.types.{StringType => SStringType}
import org.apache.spark.unsafe.types.UTF8String

/** Complete k-family MinHash signature of a whitespace-tokenized string
  * as ONE scan-stage expression: distinct word 3-gram shingles (the
  * [[WordShingles]] set, whole-text fallback for short docs) hashed
  * with the same base-xxhash64(seed 42) + SplitMix64 family mixing as
  * [[MinHashAgg]] — signatures are bit-identical to the aggregate
  * form.
  *
  * Three formulations, in ascending order of merit (all measured):
  * the BUILTIN expression composition (k nested array-transforms)
  * recomputes the shingle array per family after projection collapse —
  * 50× slower; the explode + [[MinHashAgg]] form hashes each shingle
  * once and partial-aggregates, but still pays one exchange of a
  * 64-long buffer per (doc, partition) to regroup by id; THIS
  * expression computes the whole signature where the row already is —
  * zero exchange for the signature stage at any corpus size, leaving
  * the banded candidate join as minhash dedup's only shuffle.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(v: Any): Any =
    MinHashSig.signature(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.signature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {

  /** Static so generated code can call it directly. Shingle set and
    * hash family are EXACTLY [[WordShingles.shingle]] (n = 3) and
    * [[MinHashAgg]]'s base-hash + SplitMix64 mix, so the three
    * formulations are value-identical.
    */
  def signature(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val mins = Array.fill(k)(Long.MaxValue)
    // duplicate windows contribute nothing to a min, so the k-mix loop
    // only runs per DISTINCT base hash — an open-addressed long set
    // dedupes windows at one xxhash each, keeping repetitive corpora
    // (boilerplate, templated docs) at O(distinct-shingles * k) instead
    // of O(windows * k)
    var cap = 64
    var seen = new Array[Long](cap) // 0 = empty slot
    var seenZero = false // base 0 can't live in the table — flag it
    var size = 0
    def foldMins(base: Long): Unit = {
      var i = 0
      while (i < k) {
        var z = base + 0x9E3779B97F4A7C15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < mins(i)) mins(i) = z
        i += 1
      }
    }
    def foldBase(base: Long): Unit = {
      if (base == 0L) {
        if (!seenZero) { seenZero = true; foldMins(0L) }
        return
      }
      val key = base
      var slot = (key.toInt & 0x7FFFFFFF) % cap
      while (seen(slot) != 0L) {
        if (seen(slot) == key) return // duplicate window — already folded
        slot = (slot + 1) % cap
      }
      seen(slot) = key
      size += 1
      if (size * 2 > cap) { // grow at 50% load
        val old = seen
        cap *= 2
        seen = new Array[Long](cap)
        size = 0
        var oi = 0
        while (oi < old.length) {
          val v = old(oi)
          if (v != 0L) {
            var s2 = (v.toInt & 0x7FFFFFFF) % cap
            while (seen(s2) != 0L) s2 = (s2 + 1) % cap
            seen(s2) = v
            size += 1
          }
          oi += 1
        }
      }
      foldMins(base)
    }
    def updateWith(s: String): Unit = {
      val u = UTF8String.fromString(s)
      foldBase(XxHash64Function.hash(u, SStringType, 42L))
    }
    val n = 3
    if (toks.length < n) updateWith(toks.mkString(" "))
    else {
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
        updateWith(sb.toString)
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  def minhashSig(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(MinHashSig(bridge.toExpression(c), k))
  }
}
