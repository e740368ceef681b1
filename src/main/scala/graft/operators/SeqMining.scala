package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent contiguous-pattern mining over per-entity event sequences
  * ("view → click → purchase") — the path-mining readout behind funnel
  * design and next-event models: which short journeys actually recur,
  * with what user support?
  *
  * Scale shape: one corpus-sized groupBy builds each entity's ordered
  * item array (bounded by per-entity activity — the documented model;
  * an entity with millions of events needs session-scoped mining
  * first, see [[Sessionize]]); n-gram extraction is a scan-stage array
  * fold (sequence + slice — no posexplode self-join); support counts
  * one distinct (entity, pattern) pair per pattern occurrence
  * (map-side combined). Ordering is made total by sorting on the
  * caller's order columns ++ the item itself, so ties produce one
  * deterministic sequence on any partitioning.
  */
object SeqMining {

  /** Patterns of each length in `sizes` with user support ≥
    * `minSupport` (fraction of ALL entities, incl. those too short to
    * produce the length). Output: `pattern` ("a->b->c"), `len`,
    * `n_entities`, `support` (rounded 6), sorted by nothing — order
    * downstream. Null item/order rows drop.
    */
  def contiguousPatterns(df: DataFrame, groupCol: String, orderCols: Seq[String],
                         itemCol: String, sizes: Seq[Int],
                         minSupport: Double): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1), s"bad sizes $sizes")
    require(minSupport >= 0 && minSupport <= 1, s"bad minSupport $minSupport")
    val ordStruct = struct(orderCols.map(col) :+ col(itemCol): _*)
    val seqs = df
      .filter(col(itemCol).isNotNull &&
        orderCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(ordStruct)),
        x => x.getField(itemCol)).as("__s"))
      .localCheckpoint() // entity count + every gram size read it
    val nEnt = seqs.agg(count(lit(1)).as("__ne"))
    def grams(n: Int): Column =
      // sequence(1, 0) would generate DESCENDING [1,0] — guard short arrays
      when(size(col("__s")) >= n,
        transform(sequence(lit(1), size(col("__s")) - lit(n - 1)),
          i => array_join(slice(col("__s"), i, lit(n)), "->")))
        .otherwise(array().cast("array<string>"))
    val exploded = sizes.map { n =>
      seqs.select(col(groupCol), lit(n.toLong).as("len"),
        explode(grams(n)).as("pattern"))
    }.reduce(_ unionByName _)
    exploded
      .select(col(groupCol), col("len"), col("pattern")).distinct()
      .groupBy(col("pattern"), col("len"))
      .agg(count(lit(1)).as("n_entities"))
      .crossJoin(broadcast(nEnt))
      .filter(col("n_entities").cast("double") >= lit(minSupport) * col("__ne"))
      .select(col("pattern"), col("len"), col("n_entities"),
        round(col("n_entities").cast("double") / col("__ne").cast("double")
          + lit(1e-12), 6).as("support"))
  }
}
