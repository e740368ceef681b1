package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized Count-Min sketch: estimateCount(key) against a
  * sketch carried as a (foldable) binary literal. The sketch deserializes
  * ONCE per task (transient lazy), not per row. CodegenFallback is fine
  * here: the probe side of a CMS query is a per-key aggregate output
  * (dimension-sized), not the corpus scan — the heavy side is the
  * distributed CountMinSketchAgg that BUILT the sketch.
  */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression
    with CodegenFallback with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes = Seq(BinaryType, LongType)

  require(left.foldable, "the sketch must be a literal/foldable binary")

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(bytes: Any, key: Any): Any =
    sketch.estimateCount(key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  // null-safe eval => null iff an input is null; advertising the
  // flag lets constraint inference and SimplifyGraftNullGuards
  // reason about isnotnull chains through this expression
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {

  /** Distributed sketch build: one CountMinSketchAgg over `keyCol`
    * (partials merge map-side; the driver receives a single serialized
    * sketch row — broadcast-sized). Deterministic for a fixed seed.
    */
  def buildSketch(df: org.apache.spark.sql.DataFrame, keyCol: String,
                  eps: Double = 0.001, confidence: Double = 0.99,
                  seed: Int = 42): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.bridge
    val agg = new CountMinSketchAgg(
      bridge.toExpression(col(keyCol).cast("long")),
      Literal(eps), Literal(confidence), Literal(seed))
    df.groupBy().agg(bridge.toColumn(agg.toAggregateExpression()).as("__cms"))
      .head().getAs[Array[Byte]](0)
  }

  def cmsEstimate(sketchBytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(CmsEstimate(Literal.create(sketchBytes, BinaryType),
      bridge.toExpression(key)))
  }
}
