package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiler — the "what is in this table" utility a data
  * pipeline runs before trusting a new drop: per column, row count,
  * null count, exact distinct count, and min/max rendered as strings.
  *
  * Scale design: one branch per column, each a COLUMN-PRUNED scan (the
  * parquet reader materializes only that column, so the union of k
  * branches reads each byte exactly once in total) feeding a two-level
  * aggregate: groupBy(value) with map-side partials first — the shuffle
  * carries one (value, count) pair per distinct value per partition,
  * never the rows — then a single-row rollup of the distinct-value
  * table for nulls/distincts/min/max. Everything stays HashAggregate;
  * the alternative single-pass Expand form degrades to SortAggregate
  * over a k-times-expanded row stream the moment a string column's
  * min/max enters the buffer (measured 5x slower at sf0.1), and its
  * expanded shuffle grows with k. No collects; the branch union is a
  * plan-level concat.
  */
object Profile {

  /** Profile `cols` of `df`. `render` maps a column to its string form
    * for min/max (defaults to CAST AS STRING — pass an explicit
    * renderer for doubles/timestamps, where engine formatting differs).
    */
  def profile(df: DataFrame, cols: Seq[String],
              render: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val branches = cols.map { name =>
      val asStr = render.getOrElse(name, (c: Column) => c.cast("string"))
      df.select(col(name).as("__v"))
        .groupBy(col("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .agg(
          sum(col("__cnt")).cast("long").as("n_rows"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L))
            .cast("long").as("n_null"),
          count(col("__v")).as("n_distinct"),
          asStr(min(col("__v"))).as("min_str"),
          asStr(max(col("__v"))).as("max_str"))
        .select(lit(name).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }
    branches.reduce(_.unionByName(_))
  }

  /** Benford first-significant-digit audit of a numeric column — the
    * classic fabricated-or-truncated-data detector for money-like
    * fields: naturally-occurring multiplicative values put digit d
    * first with probability log10(1 + 1/d); synthetic, capped, or
    * unit-defaulted values don't.
    *
    * The first significant digit is extracted TEXTUALLY: cast to
    * DECIMAL(18,2), render to string, take the first [1-9] character —
    * exact for "0.0023" (→ 2) and "-1234.56" (→ 1) alike, and
    * engine-portable where a floor(v/10^floor(log10 v)) formulation
    * hangs correctness on log10 rounding at decade boundaries. Zeros
    * and nulls drop (they have no first significant digit).
    *
    * Scale shape: one map-side-combined corpus groupBy onto ≤ 9 rows;
    * the digit table left-joins a constant 1..9 grid (absent digits
    * surface as 0 counts — an audit that silently omits "no 9s ever"
    * is hiding its own headline) and totals ride a global window over
    * those 9 rows. Counts exact; doubles only in the final ratios.
    *
    * Output per digit 1..9: `digit`, `n_obs`, `p_obs`, `p_exp`,
    * `chi2_term` = (p_obs−p_exp)²/p_exp·N (rounded 6; summing the
    * column gives the χ² statistic against the Benford null).
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val firstDigit = regexp_extract(
      col(valueCol).cast("decimal(18,2)").cast("string"), "[1-9]", 0)
    val counts = df.select(firstDigit.as("__d"))
      .filter(col("__d") =!= "")
      .groupBy(col("__d").cast("long").as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pObs = col("n_obs").cast("double") / col("__n").cast("double")
    val pExp = log10(lit(1.0) + lit(1.0) / col("digit"))
    spark.range(1L, 10L).toDF("digit")
      .join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .withColumn("__n", sum(col("n_obs")).over(w))
      .select(col("digit"), col("n_obs"),
        round(pObs + lit(1e-12), 6).as("p_obs"),
        round(pExp + lit(1e-12), 6).as("p_exp"),
        round((pObs - pExp) * (pObs - pExp) / pExp
          * col("__n").cast("double") + lit(1e-12), 6).as("chi2_term"))
  }

  /** Functional-dependency audit: for each candidate det → dep pair,
    * exact violation counts and the g3 repair cost (minimum rows to
    * delete for the FD to hold — Kivinen & Mannila 1995's g3 measure).
    *
    * Shape per candidate: one two-column-pruned scan into a
    * (det, dep) hash aggregate — the shuffle carries one row per
    * DISTINCT (det, dep), never the data — then a det-level rollup
    * and a 1-row summary. Candidates union at plan level (k is a
    * config-sized constant); each branch reads only its two columns,
    * so the k-candidate audit costs k pruned scans, not k full ones.
    * Output per candidate: tbl, det_col, dep_col, n_groups,
    * violating_groups, g3_rows, holds (1/0 long).
    */
  def functionalDeps(df: DataFrame, table: String,
                     candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "functionalDeps needs candidates")
    candidates.map { case (det, dep) =>
      df.select(col(det).as("__det"), col(dep).as("__dep"))
        .groupBy(col("__det"), col("__dep"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("__det"))
        .agg(count(lit(1)).as("__ndep"), sum(col("__n")).as("__rows"),
          max(col("__n")).as("__keep"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__ndep") > 1, 1L).otherwise(0L))
            .as("violating_groups"),
          sum(col("__rows") - col("__keep")).as("g3_rows"))
        .select(lit(table).as("tbl"), lit(det).as("det_col"),
          lit(dep).as("dep_col"), col("n_groups"), col("violating_groups"),
          col("g3_rows"),
          when(col("violating_groups") === 0, 1L).otherwise(0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Content manifest per partition — the integrity record a data
    * handoff ships beside the files: row count, id range, and an
    * ORDER-FREE content fingerprint: the exact sum of per-row 52-bit
    * md5 digests of id + content hash, reduced mod 10^18 so the value
    * stays a plain 64-bit integer in ANY engine (the sum itself rides
    * DECIMAL(38,0), so no overflow before the reduction at any corpus
    * size). Any row added, dropped, or mutated changes the
    * fingerprint (mod-collisions need ~10^18 tries); any engine with
    * md5 recomputes it, so producer and consumer verify without
    * trusting each other's row order or partitioning.
    *
    * Scale shape: one scan, one map-side-combined groupBy on the
    * partition columns; the digest arithmetic is codegen scan-stage.
    */
  def contentManifest(df: DataFrame, partCols: Seq[String], idCol: String,
                      contentCol: String): DataFrame = {
    require(partCols.nonEmpty, "contentManifest needs partition columns")
    val digest = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      md5(col(contentCol).cast("string")))), 1, 13), 16, 10)
      .cast("decimal(38,0)")
    df.groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        (sum(digest) % lit(1000000000000000000L)).cast("long").as("fingerprint"))
  }
}
