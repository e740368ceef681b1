package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Luhn mod-10 checksum (ISO/IEC 7812) over a digit string — the
  * validity filter that separates real card/account numbers from
  * arbitrary digit runs in PII detection (a digit regex alone
  * over-redacts ~90% of random matches). Pure-integer fold over
  * reversed digit positions, scan-stage, SQL-replayable. */
object Luhn {

  /** Luhn sum of a digits-only string column: every second digit from
    * the right doubles (minus 9 when it overflows a digit). */
  def luhnSum(digits: Column): Column = {
    val rev = reverse(digits)
    aggregate(sequence(lit(1), length(rev)), lit(0L),
      (acc: Column, i: Column) => {
        val dd = rev.substr(i, lit(1)).cast("long")
        acc + when(i % 2 === 0,
          dd * 2 - when(dd > 4, 9L).otherwise(0L)).otherwise(dd)
      })
  }

  /** True iff non-empty and the Luhn sum divides by 10. */
  def luhnValid(digits: Column): Column =
    length(digits) > 0 && luhnSum(digits) % 10 === 0
}
