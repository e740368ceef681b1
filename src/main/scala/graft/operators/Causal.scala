package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Difference-in-differences — the workhorse quasi-experimental
  * estimator when assignment isn't randomized but a before/after
  * boundary exists: the treatment effect is the TREATED group's change
  * minus the CONTROL group's change, which cancels both the permanent
  * group difference and the common time trend (parallel-trends
  * assumption — state it, don't assume it silently). Complements the
  * randomized-assignment readouts (q_cuped, q_ipw_ate).
  *
  * Scale shape: ONE map-side-combined 4-cell aggregate of
  * DECIMAL(18,2)-exact (n, Σv, Σv²); means/variances and the Welch-
  * style SE are scalar double arithmetic on that row. Nothing else
  * touches the corpus.
  */
object Causal {

  /** Propensity-score matching (nearest-below, with replacement): each
    * TREATED unit is paired with the control whose score is the
    * greatest ≤ its own — the classic PSM step after a propensity
    * model scores every unit (the [[graft.ml.LogReg]] fixed-point
    * scorer emits exact INTEGER scores, which is what keeps matching
    * deterministic). Controls are deduplicated per distinct score
    * (smallest id wins, carrying its own outcome), so the as-of match
    * is unique; unmatched treated rows keep null controls. Pair rows
    * are the output — aggregate `dy` for the ATT.
    *
    * Scale shape: one groupBy dedups controls; the match is the
    * [[AsOfJoin.leftAsOf]] union + running-last pattern on the score
    * ordering. by = ∅ here (one global ordering): at cluster scale
    * partition by score range first (the [[AsOfJoin.leftAsOfBucketed]]
    * construction with `score div B`) — documented knob, same result.
    *
    * Output per treated unit: `t_id`, `t_score_fp`, `y_t`, `c_id`,
    * `y_c`, `dy` = y_t − y_c (null when unmatched).
    */
  def psmMatch(scored: DataFrame, idCol: String, scoreCol: String,
               treatCol: String, outcomeCol: String): DataFrame = {
    val base = scored.select(col(idCol).as("uid"),
        col(scoreCol).cast("long").as("s"),
        col(treatCol).cast("int").as("__t"),
        col(outcomeCol).cast("long").as("y"))
      .filter(col("uid").isNotNull && col("s").isNotNull && col("__t").isNotNull)
      .localCheckpoint() // treated and control sides both read it
    val treated = base.filter(col("__t") === 1)
      .select(lit(1).as("__g"), col("uid"), col("s"), col("y"))
    val ctrl = base.filter(col("__t") === 0)
      .groupBy(col("s"))
      .agg(min_by(struct(col("uid"), col("y")), col("uid")).as("__c"))
      .select(lit(1).as("__g"), col("s"),
        col("__c.uid").as("uid"), col("__c.y").as("c_y"))
    AsOfJoin.leftAsOf(treated, ctrl, Seq("__g"), "s", "uid",
        rightPayload = Seq("uid", "c_y"))
      .select(col("uid").as("t_id"), col("s").as("t_score_fp"),
        col("y").as("y_t"), col("asof_uid").as("c_id"),
        col("asof_c_y").as("y_c"), (col("y") - col("asof_c_y")).as("dy"))
  }

  /** One output row: `mean_t_pre`, `mean_t_post`, `mean_c_pre`,
    * `mean_c_post`, `did`, `se_did` (all rounded 6; null when any
    * cell is empty — the design is incomplete; `se_did` additionally
    * null when any cell has n < 2). Boolean columns select the cells;
    * null flag/value rows drop.
    */
  def did(df: DataFrame, treatCol: String, postCol: String,
          valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val t = col(treatCol).cast("boolean")
    val p = col(postCol).cast("boolean")
    def cell(tag: String, pred: org.apache.spark.sql.Column) = Seq(
      sum(when(pred, 1L).otherwise(0L)).as(s"__n$tag"),
      sum(when(pred, v)).as(s"__s$tag"),
      sum(when(pred, v * v)).as(s"__q$tag"))
    val cells = cell("tp", t && p) ++ cell("tr", t && !p) ++
      cell("cp", !t && p) ++ cell("cr", !t && !p)
    val agg = df.filter(t.isNotNull && p.isNotNull && v.isNotNull)
      .agg(cells.head, cells.tail: _*)
    def m(tag: String) =
      col(s"__s$tag").cast("double") / col(s"__n$tag").cast("double")
    // variance of the cell MEAN: s²/n with s² the sample variance
    def vm(tag: String) = (col(s"__q$tag").cast("double") -
      col(s"__s$tag").cast("double") * col(s"__s$tag").cast("double")
        / col(s"__n$tag").cast("double")) /
      (col(s"__n$tag") - 1).cast("double") / col(s"__n$tag").cast("double")
    val tags = Seq("tp", "tr", "cp", "cr")
    val anyEmpty = tags.map(t0 => col(s"__n$t0") === 0).reduce(_ || _)
    val anyTiny = tags.map(t0 => col(s"__n$t0") < 2).reduce(_ || _)
    val didV = (m("tp") - m("tr")) - (m("cp") - m("cr"))
    val se = sqrt(tags.map(vm).reduce(_ + _))
    def out(c: org.apache.spark.sql.Column, guard: org.apache.spark.sql.Column) =
      when(guard, lit(null).cast("double")).otherwise(round(c + lit(1e-12), 6))
    agg.select(
      out(m("tr"), anyEmpty).as("mean_t_pre"),
      out(m("tp"), anyEmpty).as("mean_t_post"),
      out(m("cr"), anyEmpty).as("mean_c_pre"),
      out(m("cp"), anyEmpty).as("mean_c_post"),
      out(didV, anyEmpty).as("did"),
      out(se, anyEmpty || anyTiny).as("se_did"))
  }
}
