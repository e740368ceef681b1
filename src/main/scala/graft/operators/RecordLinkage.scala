package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * "A Theory for Record Linkage"): score blocked candidate pairs by
  * summing per-field agreement/disagreement log-likelihood weights
  * log2(m/u) / log2((1-m)/(1-u)), then classify against an
  * upper/lower threshold band — the standard engine behind dedup of
  * person/entity tables where no shared key exists.
  *
  * Scale design: candidates come from an equi-join on the blocking
  * key(s) — a hash-partitioned shuffle on both sides, never a cross
  * join; pair volume is sum of per-block |A_b|x|B_b|, so BLOCKING KEY
  * CHOICE is the scale knob (at 100 TB use multi-pass fine blocks —
  * sorted-neighborhood windows or phonetic keys — and cap degenerate
  * blocks with [[SubBuckets]]'s splitting, exactly like the dedup
  * stack). Field weights are LITERAL constants computed once on the
  * driver, so the per-pair score is one codegen'd projection: no UDF,
  * no extra shuffle after the join.
  *
  * m = P(field agrees | true match), u = P(field agrees | non-match);
  * both are model inputs here (in production they come from EM over
  * the agreement-pattern table, which is 2^k rows — driver-sized —
  * once the pattern counts are aggregated distributed).
  */
object RecordLinkage {

  /** One comparison field: `agree` builds a BOOLEAN agreement column
    * from the two sides' columns; (m, u) are its conditional agreement
    * probabilities. */
  final case class FieldSpec(name: String,
                             agree: (Column, Column) => Column,
                             m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"field $name needs 0 < u < m < 1, got m=$m u=$u")
    /** log2 likelihood ratios — exact double literals, shared with the
      * SQL oracle via Double.toString so both engines parse the same
      * decimal. */
    def wAgree: Double = math.log(m / u) / math.log(2.0)
    def wDisagree: Double = math.log((1 - m) / (1 - u)) / math.log(2.0)
  }

  /** Score all blocked pairs of `a` x `b`. Both sides must carry
    * `idCol` (unique per side), the `blockCols`, and every column the
    * field specs reference; columns from `a` are exposed to `agree` as
    * `a.<col>`, from `b` as `b.<col>`. Output: id_a, id_b, one
    * agreement flag per field (`agr_<name>`, 0/1 long), weight
    * (rounded 6), decision ('match' / 'possible' / 'nonmatch').
    *
    * Pairs are emitted only for id_a < id_b when `selfJoin` (dedup
    * within one table); for two-source linkage pass selfJoin=false.
    */
  def score(a: DataFrame, b: DataFrame, idCol: String,
            blockCols: Seq[String], fields: Seq[FieldSpec],
            upper: Double, lower: Double,
            selfJoin: Boolean = false): DataFrame = {
    require(fields.nonEmpty, "need at least one comparison field")
    require(lower <= upper, s"lower $lower must be <= upper $upper")
    val aa = a.select(blockCols.map(col) ++
      a.columns.filterNot(blockCols.contains).map(c => col(c).as(s"a_$c")): _*)
    val bb = b.select(blockCols.map(col) ++
      b.columns.filterNot(blockCols.contains).map(c => col(c).as(s"b_$c")): _*)
    val pairFilter =
      if (selfJoin) col(s"a_$idCol") < col(s"b_$idCol")
      else col(s"a_$idCol").isNotNull
    val joined = aa.join(bb, blockCols).filter(pairFilter)
    val agrees = fields.map { f =>
      f.agree(col(s"a_${f.name}"), col(s"b_${f.name}"))
        .cast("boolean").as(s"__agr_${f.name}")
    }
    val withAgr = joined.select(
      (col(s"a_$idCol").as("id_a") +: col(s"b_$idCol").as("id_b") +: agrees): _*)
    // fixed left-to-right addition order: both engines parse w1+w2+...
    // left-associated, so the double sum is bit-identical.
    val weight = fields.map { f =>
      when(col(s"__agr_${f.name}"), lit(f.wAgree)).otherwise(lit(f.wDisagree))
    }.reduceLeft(_ + _)
    withAgr.select(
      col("id_a") +: col("id_b") +:
        fields.map(f =>
          col(s"__agr_${f.name}").cast("long").as(s"agr_${f.name}")) :+
        round(weight + lit(1e-12), 6).as("weight") :+
        when(round(weight + lit(1e-12), 6) >= upper, lit("match"))
          .when(round(weight + lit(1e-12), 6) >= lower, lit("possible"))
          .otherwise(lit("nonmatch")).as("decision"): _*)
  }

  /** Distributed half of the EM weight-estimation loop: exact counts
    * of every agreement PATTERN (the 2^k cross-classification the EM
    * m/u re-estimates run over — 2^k rows, driver-sized for any sane
    * k, while the counting is a map-side-combined aggregate over the
    * pair stream). Output: one row per observed pattern:
    * agr_<name>... , n_pairs. */
  def patternCounts(scored: DataFrame, fields: Seq[FieldSpec]): DataFrame =
    scored.groupBy(fields.map(f => col(s"agr_${f.name}")): _*)
      .agg(count(lit(1)).as("n_pairs"))
}
