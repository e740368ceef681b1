package graft.functions

import java.math.BigDecimal

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Weighted average as a typed `Aggregator` — the PUBLIC custom-aggregate
  * API (vs the internal TypedImperativeAggregate used by MinHashAgg /
  * SimHashAgg, which buys raw buffers at the cost of private imports).
  * The (sum(v*w), sum(w)) buffer merges associatively, so map-side
  * partial aggregation applies as with any builtin.
  *
  * The buffer is exact decimal, not double: float addition is order-
  * dependent, and partial-aggregation order is nondeterministic — the
  * repo-wide parity convention (decimal-exact sums, ONE double division
  * at the end) is what keeps the result hash-reproducible and equal to
  * the DuckDB oracle's `CAST(sum(decimal) AS DOUBLE) / CAST(sum(decimal)
  * AS DOUBLE)`. `BigDecimal.valueOf(double)` uses the shortest decimal
  * representation, matching the oracle's `CAST(x AS DECIMAL(18,2))` for
  * 2-decimal money values.
  */
object WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal.ZERO, BigDecimal.ZERO)

  override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1.add(BigDecimal.valueOf(in._1).multiply(BigDecimal.valueOf(in._2))),
      b._2.add(BigDecimal.valueOf(in._2)))

  override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum() == 0) Double.NaN else r._1.doubleValue() / r._2.doubleValue()

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weightedAvg(value, weight). */
  def weightedAvg(value: Column, weight: Column): Column =
    udaf(WeightedAvg).apply(value, weight)
}
