package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The centroid distance loop — `[sum over j of (emb[j] - cents[c][j])^2
  * for every centroid c]` for an embedding column (`array<double>`)
  * against the pinned centroid matrix (`array<array<double>>`, one
  * Catalyst literal) — as a native codegen'd expression returning the
  * full distance array.
  *
  * Replaces the `transform(cents, c => aggregate(zip_with(emb, c,
  * (x, y) => (x - y) * (x - y)), 0.0, _ + _))` body shared by
  * [[graft.similarity.Ivf.assignCell]] (append-side argmin) and
  * [[graft.similarity.Ivf.probeCells]] (probe-side nearest-nProbe):
  * higher-order functions are CodegenFallback — interpreted, boxing
  * every element, rows x cells x dim boxed ops — measured at ~40
  * ms/cell/batch on a bare 20k-row 64-dim scan
  * (BENCH_CODED_CUTOVER_SF1_r15, AssignCostProbe: 280 cells cost
  * 10.9-12.1 s/batch where 40 cost 1.4-1.8 s). That cells-LINEAR term
  * is what outbid the fill term the decade cutover bought, capping
  * useful cell counts at O(100); this is [[AdcFold]]'s playbook
  * applied to the assignment side. The argmin / comparator-sort
  * wrappers around the distance array are unchanged.
  *
  * Bit-identical to the interpreted form: per centroid the sum is an
  * ascending-index left fold from +0.0 of `(x - y) * (x - y)` — the
  * exact association order of `aggregate`'s fold. Null semantics are
  * mirrored, not tightened: `zip_with` pads a length mismatch with
  * nulls and a null operand nulls the product, so `aggregate`'s sum —
  * and therefore that centroid's distance — is null; here any null
  * embedding element or per-centroid length mismatch yields a null
  * distance for the affected centroids (the matrix literal's element
  * types are non-null by construction, so only the embedding side can
  * introduce one).
  *
  * Accepts `array<float>` OR `array<double>` embeddings natively
  * (VERDICT r15 #3): a float element widens to double inside the
  * primitive loop — exact, so results are bit-identical to casting
  * first — which deletes the interpreted `transform(emb, cast)`
  * wrapper (an O(dim)-per-row boxed higher-order loop plus an array
  * allocation) from every IVF append/probe plan that feeds the raw
  * parquet embedding column.
  */
case class CentroidDists(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def inputTypes =
    Seq(org.apache.spark.sql.graft.bridge.arrayDoubleOrFloat,
      ArrayType(ArrayType(DoubleType)))

  private def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(emb: Any, cents: Any): Any =
    if (leftIsFloat)
      CentroidDists.distsFloat(emb.asInstanceOf[ArrayData],
        cents.asInstanceOf[ArrayData])
    else
      CentroidDists.dists(emb.asInstanceOf[ArrayData],
        cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (leftIsFloat) "distsFloat" else "dists"
    defineCodeGen(ctx, ev, (e, m) => s"graft.functions.CentroidDists.$fn($e, $m)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CentroidDists =
    copy(left = newLeft, right = newRight)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "centroid_dists"
}

object CentroidDists {

  /** Static so generated code calls it directly. One boxed-double
    * output slot per centroid (O(cells), allocation-trivial next to
    * the rows x cells x dim interpreted loop this replaces); the inner
    * fold runs on primitive doubles.
    */
  def dists(emb: ArrayData, cents: ArrayData): ArrayData = {
    val d = emb.numElements()
    var hasNull = false
    var i = 0
    while (i < d && !hasNull) {
      if (emb.isNullAt(i)) hasNull = true
      i += 1
    }
    val n = cents.numElements()
    val out = new Array[Any](n)
    var c = 0
    while (c < n) {
      val row = cents.getArray(c)
      if (hasNull || row.numElements() != d) out(c) = null
      else {
        var acc = 0.0
        var j = 0
        while (j < d) {
          val x = emb.getDouble(j) - row.getDouble(j)
          acc += x * x
          j += 1
        }
        out(c) = acc
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  /** [[dists]] for a raw `array<float>` embedding: identical fold, the
    * element widening to double in-loop (exact — same IEEE values as
    * casting the array first).
    */
  def distsFloat(emb: ArrayData, cents: ArrayData): ArrayData = {
    val d = emb.numElements()
    var hasNull = false
    var i = 0
    while (i < d && !hasNull) {
      if (emb.isNullAt(i)) hasNull = true
      i += 1
    }
    val n = cents.numElements()
    val out = new Array[Any](n)
    var c = 0
    while (c < n) {
      val row = cents.getArray(c)
      if (hasNull || row.numElements() != d) out(c) = null
      else {
        var acc = 0.0
        var j = 0
        while (j < d) {
          val x = emb.getFloat(j).toDouble - row.getDouble(j)
          acc += x * x
          j += 1
        }
        out(c) = acc
      }
      c += 1
    }
    new GenericArrayData(out)
  }

  def centroidDists(emb: Column, cents: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(CentroidDists(bridge.toExpression(emb),
      bridge.toExpression(cents)))
  }
}
