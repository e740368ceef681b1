package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-point gradient aggregate: one pass over (rl, xl) rows
  * maintaining the exact per-slot sums Σ rl·xl[j] for j < dims — the
  * [[GramAgg]] bounded-blob shape applied to the LogReg/Poisson
  * training gradient.
  *
  * Versus the explode form
  * (`select(rl, posexplode(xl)).groupBy(j).agg(sum((rl*x).cast(decimal(38,0))))`):
  * no (dims)× row materialization per input row and no hash-map probe
  * per element — each row is `dims` multiply-adds into a flat long
  * buffer — and the exchange carries ONE 4·dims·8-byte blob per
  * partition (≈2 KB at dims=65) instead of dims aggregation rows per
  * partition. `merge` is element-wise 128-bit addition, so map-side
  * partial aggregation works as usual.
  *
  * Exactness: each product is an exact long (`Math.multiplyExact` —
  * ANSI-parity: the replaced plan's long multiply fails fast on
  * overflow under Spark 4's default ANSI mode, so this does too); the
  * per-slot accumulator is a signed 128-bit (hi, lo) pair, so the sum
  * is exact and order-free at any row count, exactly like the
  * DECIMAL(38,0) sum it replaces (|Σ| < 2^127 ≈ 1.7e38 before either
  * form can overflow). `eval` converts each slot to DECIMAL(38,0).
  *
  * NULL/shape semantics mirror the explode form where observable:
  *   - a NULL `xl` row contributes nothing (posexplode emits no rows);
  *   - a NULL `rl`, or a NULL element `xl[j]`, contributes nothing to
  *     slot j's sum but still marks the group as present (sum skips
  *     NULL inputs; the group row exists) — a slot whose every
  *     contribution was NULL evals to a NULL sum, like `sum`;
  *   - slots are bounded to j < dims: the explode form would emit
  *     groups for longer rows' tail elements, on which the training
  *     consumer then crashed (w has dims entries) — dropping them is
  *     the defensible semantic and is spec-pinned.
  */
case class GradAgg(
    rl: Expression,
    xl: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dims >= 1, s"grad_agg needs dims >= 1, got $dims")

  // buffer layout: [hi(0..dims), lo(0..dims), nonNull(0..dims), seen(0..dims)]
  private val len = 4 * dims

  override def children: Seq[Expression] = Seq(rl, xl)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("g", DecimalType(38, 0), nullable = true))),
    containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xRaw = xl.eval(input)
    if (xRaw != null) {
      val arr = xRaw.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dims)
      val rRaw = rl.eval(input)
      var j = 0
      while (j < n) {
        buf(3 * dims + j) += 1L // group exists
        if (rRaw != null && !arr.isNullAt(j)) {
          val p = Math.multiplyExact(rRaw.asInstanceOf[Long], arr.getLong(j))
          // signed-128 accumulate: lo += p with carry into hi + sign extension
          val lo = buf(dims + j)
          val newLo = lo + p
          val carry = ((lo & p) | ((lo | p) & ~newLo)) >>> 63
          buf(j) += (p >> 63) + carry
          buf(dims + j) = newLo
          buf(2 * dims + j) += 1L
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < dims) {
      val lo = a(dims + j)
      val blo = b(dims + j)
      val newLo = lo + blo
      val carry = ((lo & blo) | ((lo | blo) & ~newLo)) >>> 63
      a(j) += b(j) + carry
      a(dims + j) = newLo
      a(2 * dims + j) += b(2 * dims + j)
      a(3 * dims + j) += b(3 * dims + j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = new scala.collection.mutable.ArrayBuffer[Any](dims)
    var j = 0
    while (j < dims) {
      if (buf(3 * dims + j) > 0L) {
        val g =
          if (buf(2 * dims + j) == 0L) null
          else {
            val big = java.math.BigInteger.valueOf(buf(j)).shiftLeft(64)
              .add(new java.math.BigInteger(
                java.lang.Long.toUnsignedString(buf(dims + j))))
            Decimal(new java.math.BigDecimal(big), 38, 0)
          }
        rows += InternalRow(j, g)
      }
      j += 1
    }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GradAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GradAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GradAgg =
    copy(rl = newChildren(0), xl = newChildren(1))

  override def prettyName: String = "grad_agg"
}

object GradAgg {
  def gradAgg(rl: Column, xl: Column, dims: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(GradAgg(bridge.toExpression(rl), bridge.toExpression(xl),
      dims).toAggregateExpression())
  }
}
