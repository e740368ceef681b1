package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Holt (double-exponential) smoothing states for a WHOLE series in ONE
  * linear fold — the aggregate that replaced the windowed
  * prefix-re-fold formulation of [[graft.operators.TimeSeries.holt]]:
  * `collect_list().over(unboundedPreceding)` + per-row `aggregate`
  * folds row i's entire prefix again, O(len²) work and O(len²) array
  * bytes per series (the old maxLen guard existed to CAP that
  * quadratic; here the same bound is just the in-memory series size).
  *
  * The recurrence, bit-identical to the Column-expression fold (same
  * IEEE op order, same `round(x + 1e-12, 6)` half-up-on-shortest-
  * decimal semantics as Spark's `Round`):
  *   seed (first non-null value):  l = x, b = 0
  *   step: l' = round(α·x + (1−α)·(l+b) + 1e-12, 6)
  *         b' = round(β·(l'−l) + (1−β)·b + 1e-12, 6)
  * Null values keep the prior state (the window form's collect_list
  * dropped them from every frame). Rows sort by the order key INSIDE
  * eval — one O(len log len) sort per series instead of the window's
  * per-key range sort, and `merge` is a plain buffer concat, so
  * map-side partial aggregation works as usual.
  *
  * Output: array<struct<order, level, trend, forecast>> — one entry per
  * non-null-order input row, exploded and joined back by the caller.
  */
case class HoltStatesAgg(
    order: Expression,
    value: Expression,
    alpha: Double,
    beta: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, java.lang.Double)]] {

  override def children: Seq[Expression] = Seq(order, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("order", LongType, nullable = false),
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false),
    StructField("forecast", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Long, java.lang.Double)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, java.lang.Double)],
                      input: InternalRow): ArrayBuffer[(Long, java.lang.Double)] = {
    val o = order.eval(input)
    if (o != null) {
      val v = value.eval(input)
      buf += ((o.asInstanceOf[Long],
        if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double])))
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, java.lang.Double)],
                     b: ArrayBuffer[(Long, java.lang.Double)]): ArrayBuffer[(Long, java.lang.Double)] =
    a ++= b

  /** Spark Round semantics on DoubleType: half-up over the double's
    * shortest decimal representation (BigDecimal.valueOf).
    */
  private def r6(d: Double): Double =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  override def eval(buf: ArrayBuffer[(Long, java.lang.Double)]): Any = {
    val rows = buf.sortBy(_._1)
    var l = 0.0; var b = 0.0; var seeded = false
    val out = new Array[Any](rows.length)
    var i = 0
    while (i < rows.length) {
      val (o, v) = rows(i)
      if (v != null) {
        val x = v.doubleValue()
        if (!seeded) { l = x; b = 0.0; seeded = true }
        else {
          val nl = r6(alpha * x + (1 - alpha) * (l + b) + 1e-12)
          val nb = r6(beta * (nl - l) + (1 - beta) * b + 1e-12)
          l = nl; b = nb
        }
      }
      out(i) = new GenericInternalRow(Array[Any](o, l, b, r6(l + b + 1e-12)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ArrayBuffer[(Long, java.lang.Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 17)
    bb.putInt(buf.length)
    buf.foreach { case (o, v) =>
      bb.putLong(o)
      if (v == null) bb.put(0: Byte).putLong(0L)
      else bb.put(1: Byte).putLong(java.lang.Double.doubleToLongBits(v.doubleValue()))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, java.lang.Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new ArrayBuffer[(Long, java.lang.Double)](n)
    var i = 0
    while (i < n) {
      val o = bb.getLong
      val has = bb.get() == (1: Byte)
      val bits = bb.getLong
      out += ((o, if (has) java.lang.Double.valueOf(
        java.lang.Double.longBitsToDouble(bits)) else null))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HoltStatesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HoltStatesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HoltStatesAgg =
    copy(order = newChildren(0), value = newChildren(1))

  override def prettyName: String = "holt_states"
}

object HoltStatesAgg {
  def holtStates(order: Column, value: Column, alpha: Double, beta: Double): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(HoltStatesAgg(bridge.toExpression(order),
      bridge.toExpression(value), alpha, beta).toAggregateExpression())
  }
}
