package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al. 2005) heavy-hitters sketch as a
  * `TypedImperativeAggregate` — frequent-items estimation in bounded
  * memory, completing the mergeable-sketch family next to HLL
  * (approx distinct), CMS (point frequency), and bitmap distinct.
  *
  * The buffer holds at most `capacity` (item, count, err) counters. A
  * resident item increments; a non-resident item replaces the minimum
  * counter, inheriting its count as both floor and error bound. The
  * classic guarantees hold per summary: true <= est <= true + n/capacity,
  * and every item with frequency > n/capacity is resident.
  *
  * `merge` (mergeable-summaries form, Agarwal et al. 2012): sum counts
  * of common items, keep the top `capacity` by merged count; absent-side
  * contribution is zero, which relaxes the one-sided overcount to a
  * two-sided |est - true| <= n/capacity at the same capacity.
  *
  * Scale design: map-side partials and the exchange each carry at most
  * `capacity` counters per partition REGARDLESS of input size — the same
  * bounded-blob shape as [[MinHashAgg]]. Eviction scans the counter map
  * (O(capacity)); a production stream-summary keeps a min-structure, but
  * the scan is bounded and branch-free enough that capacities in the
  * thousands stay cheap.
  *
  * Determinism: WITH eviction the resident set depends on encounter
  * order, so results are partitioning-dependent (within the bounds) —
  * spec-checked, not oracle-able. With `capacity` >= the distinct count
  * no eviction ever fires, every err is 0, and the result is the EXACT
  * frequency table in any processing order — that regime is oracle-able
  * against a plain GROUP BY (q_heavy_hitters).
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(capacity > 0, "SpaceSavingAgg capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  override def update(buf: mutable.LinkedHashMap[String, (Long, Long)],
                      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some((n, e)) => buf.update(item, (n + 1, e))
        case None if buf.size < capacity => buf.update(item, (1L, 0L))
        case None =>
          // evict the minimum counter (ties: first-inserted wins — any
          // tie-break preserves the bounds); inherit its count as error
          val (minItem, (minN, _)) = buf.minBy(_._2._1)
          buf.remove(minItem)
          buf.update(item, (minN + 1, minN))
      }
    }
    buf
  }

  override def merge(a: mutable.LinkedHashMap[String, (Long, Long)],
                     b: mutable.LinkedHashMap[String, (Long, Long)]): mutable.LinkedHashMap[String, (Long, Long)] = {
    b.foreach { case (item, (n, e)) =>
      a.get(item) match {
        case Some((n0, e0)) => a.update(item, (n0 + n, e0 + e))
        case None           => a.update(item, (n, e))
      }
    }
    if (a.size <= capacity) a
    else {
      // keep the top `capacity` by count (deterministic item tie-break)
      val kept = a.toSeq.sortBy { case (item, (n, _)) => (-n, item) }.take(capacity)
      val out = mutable.LinkedHashMap.empty[String, (Long, Long)]
      kept.foreach { case (item, ne) => out.update(item, ne) }
      out
    }
  }

  override def eval(buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val rows = buf.toSeq.sortBy { case (item, (n, _)) => (-n, item) }
      .map { case (item, (n, e)) =>
        org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(item), n, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val items = buf.toSeq.map { case (s, ne) => (s.getBytes("UTF-8"), ne) }
    val bb = ByteBuffer.allocate(4 + items.map(16 + 4 + _._1.length).sum)
    bb.putInt(items.size)
    items.foreach { case (bytes, (n, e)) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(n); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var k = bb.getInt
    while (k > 0) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out.update(new String(b, "UTF-8"), (bb.getLong, bb.getLong))
      k -= 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "space_saving"
}

object SpaceSavingAgg {
  /** Heavy-hitter counters for a string column: array<struct<item,n,err>>
    * sorted by (n desc, item). */
  def spaceSaving(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(SpaceSavingAgg(bridge.toExpression(c), capacity).toAggregateExpression())
  }
}
