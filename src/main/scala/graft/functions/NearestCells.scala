package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The `nProbe` nearest cell ids from a distance array — bounded
  * partial selection over a `centroid_dists` output (`array<double>`,
  * index = cell id) — as a native codegen'd expression returning
  * `array<int>` ordered by (distance asc, cell id asc).
  *
  * Replaces [[graft.similarity.Ivf.probeCells]]' interpreted comparator
  * `array_sort` over the cell-index sequence (rows × cells·log·cells
  * boxed comparator lambda calls — the dominant probe-side term after
  * [[CentroidDists]] landed: 5.9 vs 1.2 ms/cell/batch,
  * BENCH_CODED_CUTOVER_SF1_r15 `fixed_same_round.micro_after`) and the
  * interpreted `transform/array_min/array_position` argmin wrapper in
  * [[graft.similarity.Ivf.assignCell]] (the nProbe = 1 face, via
  * [[NearestCells.nearestCell]]). Cost is O(cells + improvements ×
  * nProbe) per row — the common case is ONE primitive compare against
  * the current worst — vs the sort's O(cells log cells) interpreted
  * comparator calls; nProbe is small (1–32) by the probe contract.
  *
  * Value-identical to the interpreted forms on every reachable input:
  * distances are per-cell sums of squares (non-null, non-NaN, ≥ +0.0
  * for real embeddings), where (dist asc, cell asc) is exactly the
  * `array_sort` comparator's order and the first element is exactly
  * `array_position(ds, array_min(ds)) - 1`. The degenerate inputs are
  * TIGHTENED to a total order rather than replicated: a null distance
  * (a per-cell length mismatch — unreachable under trainCentroids'
  * uniform dims) sorts AFTER every non-null distance; an all-null
  * distance array returns null (matching assignCell's null, where the
  * interpreted probe comparator degenerated to identity order and
  * emitted cells 0..nProbe-1 for a row with NO defined distances); NaN
  * sorts greater than every finite distance and -0.0 before 0.0
  * (`java.lang.Double.compare` — the interpreted `<`/`>` comparator
  * treated both as ties, an inconsistent order whose sort output was
  * algorithm-defined; both are unreachable from sums of squares).
  */
case class NearestCells(child: Expression, nProbe: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(ArrayType(DoubleType))

  // null child OR an all-null distance array yields null
  override def nullable: Boolean = true

  override def nullSafeEval(dists: Any): Any =
    NearestCells.select(dists.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NearestCells.select($c, $nProbe);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

object NearestCells {

  /** Static so generated code calls it directly. Returns the
    * min(nProbe, n) nearest indices as a primitive int array, or null
    * when no distance is defined (all-null input). Bounded insertion
    * into a sorted size-nProbe window: ascending iteration makes the
    * index tie-break free (an equal-distance later cell is never
    * "before" an earlier one), and a single worst-entry compare rejects
    * the common case in O(1).
    */
  def select(dists: ArrayData, nProbe: Int): ArrayData = {
    val n = dists.numElements()
    val m = if (nProbe < n) nProbe else n
    val bd = new Array[Double](m) // distance per kept entry, sorted
    val bi = new Array[Int](m)    // cell id per kept entry
    val bn = new Array[Boolean](m) // null-distance marker (sorts last)
    var filled = 0
    var sawNonNull = false
    var c = 0
    while (c < n) {
      val isN = dists.isNullAt(c)
      val d = if (isN) 0.0 else dists.getDouble(c)
      if (!isN) sawNonNull = true
      // strictly-before test vs the current worst; ties keep the
      // incumbent (lower cell id, because iteration is ascending)
      val admit = filled < m ||
        before(isN, d, bn(filled - 1), bd(filled - 1))
      if (admit && m > 0) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && before(isN, d, bn(pos - 1), bd(pos - 1))) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); bn(pos) = bn(pos - 1)
          pos -= 1
        }
        bd(pos) = d; bi(pos) = c; bn(pos) = isN
        if (filled < m) filled += 1
      }
      c += 1
    }
    if (n > 0 && !sawNonNull) null
    else UnsafeArrayData.fromPrimitiveArray(
      if (filled == m) bi else java.util.Arrays.copyOf(bi, filled))
  }

  /** Total order: non-null before null; among non-null,
    * java.lang.Double.compare (NaN greatest, -0.0 < 0.0). */
  @inline private def before(aNull: Boolean, a: Double,
                             bNull: Boolean, b: Double): Boolean =
    if (aNull) false
    else if (bNull) true
    else java.lang.Double.compare(a, b) < 0

  def nearestCells(dists: Column, nProbe: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.toColumn(NearestCells(bridge.toExpression(dists), nProbe))
  }

  /** The argmin face: nearest single cell id as `int`, null when no
    * distance is defined — [[graft.similarity.Ivf.assignCell]]'s body.
    */
  def nearestCell(dists: Column): Column =
    org.apache.spark.sql.functions.element_at(nearestCells(dists, 1), 1)
}
