package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules (support / confidence / lift) over
  * transaction data — "users who error also purchase?", the
  * market-basket audit over per-user event-type sets. Complements
  * the PMI collocation miner in [[graft.text.TextFns]] (token windows)
  * with the transaction-level framing: items co-occurring in the same
  * basket regardless of order or distance.
  *
  * Only ITEM PAIRS are mined (the 2-itemset lattice level). That is
  * deliberate: pair rules are the overwhelmingly-used output, the pair
  * lattice is |items|²-bounded so the whole computation stays
  * aggregate-sized, and deeper levels would need the iterative Apriori
  * candidate loop whose output is data-dependent and unbounded.
  *
  * Scale shape: ONE corpus-sized distinct (transaction, item) —
  * map-side combined, the only corpus-sized exchange. The within-
  * transaction self-join on `a.item < b.item` costs Σ_tx |items_tx|²/2
  * with |items_tx| ≤ |distinct items| (an enum-like column, not an
  * open domain), pair counts and item counts are |items|²-bounded, and
  * everything joins back by broadcast. Counts are exact longs; doubles
  * appear only in the three final ratios, so results are
  * partitioning-independent.
  *
  * Output per surviving DIRECTED rule antecedent → consequent (both
  * directions of each unordered pair): `antecedent`, `consequent`,
  * `n_tx` (transactions), `n_pair`, `n_ante`, `n_cons` (exact counts),
  * `support` = n_pair/n_tx, `confidence` = n_pair/n_ante,
  * `lift` = n_pair·n_tx/(n_ante·n_cons) (each rounded 6). Rules with
  * support < `minSupport` are dropped.
  */
object AssocRules {

  def pairRules(df: DataFrame, txCol: String, itemCol: String,
                minSupport: Double): DataFrame = {
    require(minSupport >= 0 && minSupport <= 1,
      s"minSupport must be in [0,1], got $minSupport")
    val items = df
      .filter(col(txCol).isNotNull && col(itemCol).isNotNull)
      .select(col(txCol).as("__tx"), col(itemCol).as("__item"))
      .distinct()
    val nTx = items.agg(countDistinct(col("__tx")).as("n_tx"))
    val itemCounts = items.groupBy(col("__item")).agg(count(lit(1)).as("__ni"))
    val pairs = items.select(col("__tx"), col("__item").as("__a"))
      .join(items.select(col("__tx"), col("__item").as("__b")), Seq("__tx"))
      .filter(col("__a") < col("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("n_pair"))
    // both directions of each unordered pair become a rule
    val directed = pairs.select(col("__a").as("antecedent"),
        col("__b").as("consequent"), col("n_pair"))
      .unionAll(pairs.select(col("__b").as("antecedent"),
        col("__a").as("consequent"), col("n_pair")))
    val sup = col("n_pair").cast("double") / col("n_tx").cast("double")
    val conf = col("n_pair").cast("double") / col("n_ante").cast("double")
    val lift = col("n_pair").cast("double") * col("n_tx").cast("double") /
      col("n_ante").cast("double") / col("n_cons").cast("double")
    directed
      .join(broadcast(itemCounts.select(col("__item").as("antecedent"),
        col("__ni").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(itemCounts.select(col("__item").as("consequent"),
        col("__ni").as("n_cons"))), Seq("consequent"))
      .crossJoin(broadcast(nTx))
      .filter(sup >= minSupport)
      .select(col("antecedent"), col("consequent"), col("n_tx"),
        col("n_pair"), col("n_ante"), col("n_cons"),
        round(sup + lit(1e-12), 6).as("support"),
        round(conf + lit(1e-12), 6).as("confidence"),
        round(lift + lit(1e-12), 6).as("lift"))
  }
}
