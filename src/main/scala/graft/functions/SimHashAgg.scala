package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a custom `TypedImperativeAggregate`: aggregates 64-bit token
  * hashes into a 64-bit signature by per-bit majority vote.
  *
  * The buffer is a single int[64] vote array — compared with the
  * expression-composed form (64 separate conditional SUM columns), the
  * shuffle row shrinks from 64 longs to one 256-byte blob and the
  * aggregate is one buffer update per row instead of 64 column updates.
  * Partial aggregation works as usual: `merge` adds vote vectors, so the
  * map-side combine keeps the exchange at one row per (group, partition).
  *
  * Input: a LongType column of token hashes (e.g. xxhash64(token)).
  * Output: the LongType simhash signature.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  def simhashAgg(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(SimHashAgg(bridge.toExpression(c)).toAggregateExpression())
  }
}
