package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension — preference order (c) from the
  * build plan: a custom LogicalPlan + SparkStrategy + two physical
  * operators, registered via SparkSessionExtensions.
  *
  * Top-k per group via the window pattern (`row_number().over(...) <= k`)
  * SORTS EVERY GROUP COMPLETELY and shuffles EVERY input row — at 100 TB
  * the shuffle is sized by the fact table. This operator keeps a bounded
  * heap of k rows per group on the map side, so the exchange carries at
  * most k rows per (group, input partition) — shuffle volume scales with
  * k * groups, not with input rows, and nothing is ever fully sorted
  * except the k survivors of each group. The map-side prune is correct
  * because the ordering is total (callers must include a tiebreak).
  */
case class TopKPerGroup(group: Seq[Expression], order: Seq[SortOrder], k: Int,
                        rnAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {

  /** DataFrame API: top `k` rows per `groupCols`, ranked by `orderCol`
    * (desc by default) with `tieCol` ascending as the deterministic
    * tiebreak; appends a `rn` rank column (1-based). Requires
    * `TopKStrategy` on the session (GraftExtensions).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
               tieCol: String, k: Int, desc: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val order = Seq(
      SortOrder(attr(orderCol), if (desc) Descending else Ascending),
      SortOrder(attr(tieCol), Ascending))
    bridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), order, k,
        AttributeReference("rn", LongType, nullable = false)(), plan))
  }

  /** Shared map-side prune: one bounded max-heap (worst-on-top w.r.t. the
    * sort order) of size k per group key present in the partition.
    */
  private[plans] def prune(it: Iterator[InternalRow], group: Seq[Expression],
                           order: Seq[SortOrder], k: Int,
                           schema: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(group, schema)
    val ord = RowOrdering.create(order, schema)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (it.hasNext) {
      val row = it.next()
      val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
        mutable.PriorityQueue.empty[InternalRow](ord)) // dequeues worst first
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side phase: prune to at most k rows per (group, partition). */
case class PartialTopKExec(group: Seq[Expression], order: Seq[SortOrder], k: Int,
                           child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, schema) = (group, order, k, child.output)
    child.execute().mapPartitions(
      TopKPerGroup.prune(_, g, o, kk, schema), preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Reduce-side phase: groups are clustered here (EnsureRequirements
  * inserts the exchange over the PRUNED rows); merge each group's
  * survivors, sort the <= k*partitions of them, emit the top k with a
  * 1-based rank appended.
  */
case class FinalTopKExec(group: Seq[Expression], order: Seq[SortOrder], k: Int,
                         rnAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) AllTuples :: Nil else ClusteredDistribution(group) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, schema, out) = (group, order, k, child.output, output)
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(g, schema)
      val ord = RowOrdering.create(o, schema)
      val groups = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        groups.getOrElseUpdate(keyProj(row).copy(), mutable.ArrayBuffer.empty) += row.copy()
      }
      val proj = UnsafeProjection.create(out, schema :+ rnAttr)
      val joined = new JoinedRow
      groups.valuesIterator.flatMap { rows =>
        rows.sorted(ord).iterator.take(kk).zipWithIndex.map { case (r, i) =>
          proj(joined(r, new GenericInternalRow(Array[Any]((i + 1).toLong))))
        }
      }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to partial -> (exchange
  * inserted by EnsureRequirements) -> final.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rn, child) =>
      FinalTopKExec(g, o, k, rn, PartialTopKExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
