package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators from the reference inventory (SURVEY.md §2.5).
  *
  * Both reference joins have dimension-sized build sides (≤ few hundred
  * rows), so we broadcast explicitly — at 100 TB the probe side streams
  * through map-side hash joins with zero shuffle.
  */
object Joins {

  /** Multi-key inner equi-join, USING-style so key columns appear once
    * (ref: etl.py:186 — recombining the first-agg stats with the race
    * pivot on [City, State, State Code]).
    */
  def recombineInner(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "inner")

  /** Left-outer lookup join on a computed key against a small dimension,
    * broadcast (ref: etl.py:388 — country lookup joined on lower-cased
    * names).
    */
  def lookupLeft(fact: DataFrame, lookup: DataFrame, cond: Column): DataFrame =
    fact.join(broadcast(lookup), cond, "left")
}
