package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gram-matrix aggregate: one pass over an embedding column maintaining
  * count, per-dimension sums, and the upper-triangle Σ v_i·v_j in a
  * single flat double buffer — the [[MinHashAgg]] bounded-blob shape
  * applied to PCA's data pass.
  *
  * Versus the explode form ([[graft.similarity.EmbedStats.gramMatrix]]):
  * no k² row materialization per input row and no hash-map probe per
  * entry — each row is k(k+1)/2 fused multiply-adds into a flat array —
  * and the exchange carries ONE (1 + k + k(k+1)/2)·8-byte blob per
  * partition (≈17 KB at k=64) instead of k² aggregation rows. `merge`
  * is element-wise addition, so map-side partial aggregation works as
  * usual and shard results combine without rescans.
  *
  * Rows whose array is null or whose length ≠ `dim` are skipped (the
  * explode form silently mis-indexes on ragged input; skipping is the
  * defensible semantic and is spec-pinned).
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val tri = dim * (dim + 1) / 2
  private val len = 1 + dim + tri

  // lazy: child is unresolved (NullType) at construction time; the
  // element type is only known once analysis binds the attribute
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"gram_agg needs an array<float|double> column, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("gram", DoubleType, nullable = false),
    StructField("mean_i", DoubleType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val raw = child.eval(input)
    if (raw != null) {
      val arr = raw.asInstanceOf[ArrayData]
      // a null ELEMENT would read as 0.0 through getFloat/getDouble and
      // silently skew the moments — skip the whole row instead, like
      // ragged rows. (The explode reference form instead null-propagates
      // just that element's terms; rows with null elements are malformed
      // either way, and skipping keeps n consistent across all moments.)
      var clean = arr.numElements() == dim
      if (clean) {
        var c = 0
        while (c < dim && clean) { clean = !arr.isNullAt(c); c += 1 }
      }
      if (clean) {
        val v = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        buf(0) += 1.0
        i = 0
        var off = 1 + dim
        while (i < dim) {
          buf(1 + i) += v(i)
          val vi = v(i)
          var j = i
          while (j < dim) {
            buf(off) += vi * v(j)
            j += 1
            off += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val n = buf(0).toLong
    if (n == 0L) return new GenericArrayData(Array.empty[Any])
    val rows = new Array[Any](tri)
    var i = 0
    var off = 1 + dim
    var out = 0
    while (i < dim) {
      val mean = buf(1 + i) / buf(0)
      var j = i
      while (j < dim) {
        rows(out) = InternalRow(i, j, buf(off), mean, n)
        out += 1
        off += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "gram_agg"
}

object GramAgg {
  def gramAgg(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(GramAgg(bridge.toExpression(c), dim).toAggregateExpression())
  }
}
