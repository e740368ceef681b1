package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a custom `TypedImperativeAggregate`: one pass over
  * the shingles of a group, maintaining all `k` family minima in a single
  * long[k] buffer.
  *
  * Versus the composed form (k separate `min(xxhash64(seed, s))` agg
  * columns): one aggregate function instead of k, one buffer update per
  * row hashing the shingle k times with cheap seed mixing, and a k*8-byte
  * blob on the exchange. `merge` takes element-wise minima, so map-side
  * partial aggregation works as usual.
  *
  * Hash family: xxhash64-compatible seeding is not required — any k
  * independent 64-bit families work for MinHash. We use the shingle's
  * 64-bit xxhash64 (seed 42, Spark's default — `XxHash64Function`, the
  * same function behind the `xxhash64` SQL builtin) mixed per family
  * with a SplitMix64 finalizer, which keeps the families pairwise
  * independent and the per-row cost at one string hash + k integer
  * mixes. The base hash being 64-bit matters at corpus-scale shingle
  * cardinality: with a 32-bit base, two distinct shingles colliding in
  * 32 bits (birthday-likely beyond ~2^16 shingles) would become
  * identical in EVERY family simultaneously, correlating the estimator.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        v, org.apache.spark.sql.types.StringType, 42L)
      var i = 0
      while (i < k) {
        // SplitMix64 finalizer over (base, family) — cheap independent families
        var z = base + 0x9E3779B97F4A7C15L * (i + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < buf(i)) buf(i) = z
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  def minhashAgg(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(MinHashAgg(bridge.toExpression(c), k).toAggregateExpression())
  }
}
