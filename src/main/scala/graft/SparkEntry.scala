package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DateFns, PolyHash, TitleCase}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every query (for DuckDB-oracle hash parity):
  *   - integer outputs are cast to BIGINT (DuckDB's default int width);
  *   - money sums go through DECIMAL(18,2) (order-independent, exact) and
  *     are cast to DOUBLE at the end — both engines then hold identical
  *     IEEE values;
  *   - dates/timestamps are emitted as ISO strings or epoch micros, never
  *     as raw temporal types (parquet ns vs us physical types would
  *     otherwise diverge).
  */
object SparkEntry {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def iso(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_date_dim")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Queries: one per implemented operator from SURVEY.md §2.
  // ---------------------------------------------------------------------

  /** S3+P1-P3+C3-C6+F3+A4: the reference's arrival-date dimension
    * (etl.py:276-336) over orders.o_orderdate. */
  private def qDateDim(s: SparkSession, d: String): DataFrame =
    DateDimension.build(Tables.orders(s, d), to_date(col("o_orderdate")))
      .select(
        iso(col("arrival_iso_date")).as("arrival_iso_date"),
        col("arrival_year").cast("long").as("arrival_year"),
        col("arrival_month").cast("long").as("arrival_month"),
        col("arrival_day").cast("long").as("arrival_day"),
        col("day_of_week").cast("long").as("day_of_week"),
        col("arrival_weekofyear").cast("long").as("arrival_weekofyear"),
        col("date_season"))

  /** U1+U2 native replacements (etl.py:61-90): SAS epoch day-offset ->
    * ISO date string; day difference between two derived dates. */
  private def qSasDate(s: SparkSession, d: String): DataFrame = {
    val days1 = col("o_orderkey") % 23000
    val days2 = (col("o_orderkey") * 3) % 23000
    Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      DateFns.sasDateStr(days1).as("sas_date"),
      DateFns.stayDays(DateFns.sasDate(days1), DateFns.sasDate(days2))
        .cast("long").as("stay_days"))
  }

  /** U4 native replacement (etl.py:119-125): Python-falsy guard — day
    * offset 0 maps to null, not 1960-01-01. */
  private def qSasZeroNull(s: SparkSession, d: String): DataFrame = {
    val days = (col("o_orderkey") % 5) * 400
    Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      iso(DateFns.sasDateZeroNull(days)).as("maybe_date"))
  }

  /** U2 on real columns (etl.py:267): stay = datediff over a fact/dim
    * join (broadcast dim at scale; here both sides are fact-sized so the
    * shuffle hash join AQE picks is right). */
  private def qStay(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        DateFns.stayDays(to_date(col("o_orderdate")), to_date(col("l_shipdate")))
          .cast("long").as("stay_days"))
  }

  /** U3 native replacement (etl.py:105-117): Python str.title() as a
    * codegen'd Catalyst expression. */
  private def qTitleCase(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      TitleCase.titlecase(lower(col("c_name"))).as("name_title"),
      TitleCase.titlecase(lower(col("c_mktsegment"))).as("segment_title"))

  /** P1/P4/C1 (etl.py:237-256,278-286): projection with per-column casts. */
  private def qCastProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"),
      col("l_linenumber").cast("long").as("l_linenumber"),
      col("l_quantity").cast("long").as("qty"),
      floor(col("l_extendedprice")).cast("long").as("price_floor"),
      col("l_returnflag"))

  /** A1 (etl.py:169-180): first-value-per-group stats, made deterministic
    * via min_by (SURVEY.md §7.4). */
  private def qFirstAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(
        Aggregates.firstBy(col("c_name"), col("c_custkey")).as("first_name"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        count(lit(1)).as("n"))

  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** A2 (etl.py:183): pivot with explicit value list — single-pass, fixed
    * output schema. */
  private def qPivot(s: SparkSession, d: String): DataFrame = {
    val p = Aggregates.pivotAgg(
      Tables.customer(s, d).withColumn("c_nationkey", col("c_nationkey").cast("long")),
      Seq("c_nationkey"), "c_mktsegment", Segments, sum(dec(col("c_acctbal"))))
    p.select(col("c_nationkey") +: Segments.map(v => col(v).cast("double").as(v)): _*)
  }

  /** A3 (etl.py:355-358): avg + first aggregate, temperature-pipeline
    * shape. Decimal-exact sum, then double division. */
  private def qAvgFirst(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        iso(min(to_date(col("l_shipdate")))).as("first_ship"),
        count(lit(1)).as("n"))

  /** A4 (etl.py:289,310): whole-row dedup as distinct-aggregate. */
  private def qDedup(s: SparkSession, d: String): DataFrame =
    Aggregates.dedup(
      Tables.orders(s, d).select(
        col("o_orderstatus"), col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("order_year")))

  /** A5/Q1 (etl.py:127-143): row-count quality gate over every table. */
  private def qQualityCounts(s: SparkSession, d: String): DataFrame =
    Tables.names.map { t =>
      Tables.load(s, d, t).agg(count(lit(1)).as("cnt")).select(lit(t).as("tbl"), col("cnt"))
    }.reduce(_.unionAll(_))

  /** J1 (etl.py:186): recombine two aggregates of the same input with a
    * multi-key USING inner join. */
  private def qJoinRecombine(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
    Joins.recombineInner(stats, qPivot(s, d), Seq("c_nationkey"))
  }

  /** J2+F2+U3 (etl.py:388-391): broadcast left-lookup join with a
    * null-coalescing patch of misses. */
  private def qLookupLeft(s: SparkSession, d: String): DataFrame = {
    val lookup = Tables.nation(s, d)
      .filter(col("n_nationkey") < 15)
      .select(col("n_nationkey"), TitleCase.titlecase(lower(col("n_name"))).as("nation_name"))
    val joined = Joins.lookupLeft(
      Tables.customer(s, d), lookup, col("c_nationkey") === col("n_nationkey"))
    ColumnOps.coalescePatch(joined, "nation_name", lit("Unknown"))
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"), col("nation_name"))
  }

  /** F1 (etl.py:92-103,367,384): conditional value rewrites. */
  private def qCondFix(s: SparkSession, d: String): DataFrame =
    ColumnOps.conditionalReplace(
      Tables.nation(s, d), "n_name",
      Seq("NATION_0" -> "NATION_ZERO", "NATION_7" -> "LUCKY_NATION"))
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))

  /** P7 (etl.py:199-215): fillna(0) over numeric columns after an outer
    * join leaves nulls. */
  private def qFillna(s: SparkSession, d: String): DataFrame = {
    val suppAgg = Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"), sum(dec(col("s_acctbal"))).cast("double").as("supp_bal"))
    val joined = Tables.nation(s, d)
      .join(suppAgg, col("n_nationkey") === col("s_nationkey"), "left")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_supp"), col("supp_bal"))
    ColumnOps.fillZeros(joined, Seq("n_supp", "supp_bal"))
  }

  /** K3 + SQL front-end (etl.py:313-330): temp view + spark.sql CASE
    * season — the reference's only SQL-string query. */
  private def qSqlSeason(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("arrival_date_src")
    s.sql("""
      SELECT DISTINCT CAST(month(o_orderdate) AS BIGINT) AS arrival_month,
        CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'winter'
             WHEN month(o_orderdate) IN (3, 4, 5) THEN 'spring'
             WHEN month(o_orderdate) IN (6, 7, 8) THEN 'summer'
             ELSE 'autumn' END AS date_season
      FROM arrival_date_src""")
  }

  /** P5/P6 (etl.py:186-197,262-264): bulk rename + column drops as one
    * Project. */
  private def qRenameDrop(s: SparkSession, d: String): DataFrame = {
    val slim = Tables.lineitem(s, d).drop("l_comment", "l_tax", "l_discount")
    ColumnOps.renameAll(slim, Map(
      "l_quantity" -> "qty", "l_extendedprice" -> "price",
      "l_returnflag" -> "flag", "l_linestatus" -> "status"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("qty"), col("price"), col("flag"), col("status"))
  }

  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_date_dim"       -> (qDateDim _),
    "q_sas_date"       -> (qSasDate _),
    "q_sas_zero_null"  -> (qSasZeroNull _),
    "q_stay"           -> (qStay _),
    "q_title_case"     -> (qTitleCase _),
    "q_cast_project"   -> (qCastProject _),
    "q_first_agg"      -> (qFirstAgg _),
    "q_pivot"          -> (qPivot _),
    "q_avg_first"      -> (qAvgFirst _),
    "q_dedup"          -> (qDedup _),
    "q_quality_counts" -> (qQualityCounts _),
    "q_join_recombine" -> (qJoinRecombine _),
    "q_lookup_left"    -> (qLookupLeft _),
    "q_cond_fix"       -> (qCondFix _),
    "q_fillna"         -> (qFillna _),
    "q_sql_season"     -> (qSqlSeason _),
    "q_rename_drop"    -> (qRenameDrop _),
  )

  /** DuckDB oracle SQL per query (same table names, same column aliases —
    * the driver sorts columns by name before hashing). */
  def oracleSql: Map[String, String] = Map(
    "q_date_dim" -> """
      SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS arrival_iso_date,
        year(o_orderdate) AS arrival_year, month(o_orderdate) AS arrival_month,
        day(o_orderdate) AS arrival_day, dayofweek(o_orderdate) + 1 AS day_of_week,
        weekofyear(o_orderdate) AS arrival_weekofyear,
        CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'winter'
             WHEN month(o_orderdate) IN (3, 4, 5) THEN 'spring'
             WHEN month(o_orderdate) IN (6, 7, 8) THEN 'summer'
             ELSE 'autumn' END AS date_season
      FROM orders""",
    "q_sas_date" -> """
      SELECT o_orderkey AS k,
        strftime(DATE '1960-01-01' + CAST(o_orderkey % 23000 AS INTEGER), '%Y-%m-%d') AS sas_date,
        datediff('day', DATE '1960-01-01' + CAST(o_orderkey % 23000 AS INTEGER),
                 DATE '1960-01-01' + CAST((o_orderkey * 3) % 23000 AS INTEGER)) AS stay_days
      FROM orders""",
    "q_sas_zero_null" -> """
      SELECT o_orderkey AS k,
        CASE WHEN (o_orderkey % 5) * 400 = 0 THEN NULL
             ELSE strftime(DATE '1960-01-01' + CAST((o_orderkey % 5) * 400 AS INTEGER), '%Y-%m-%d')
        END AS maybe_date
      FROM orders""",
    "q_stay" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS stay_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q_title_case" -> """
      SELECT c_custkey,
        upper(substr(lower(c_name), 1, 1)) || substr(lower(c_name), 2) AS name_title,
        upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS segment_title
      FROM customer""",
    "q_cast_project" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        CAST(trunc(l_quantity) AS BIGINT) AS qty,
        CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, l_returnflag
      FROM lineitem""",
    "q_first_agg" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        arg_min(c_name, c_custkey) AS first_name,
        min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal, count(*) AS n
      FROM customer GROUP BY 1""",
    "q_pivot" -> s"""
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        ${Segments.map(v => s"CAST(sum(CASE WHEN c_mktsegment = '$v' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS \"$v\"").mkString(", ")}
      FROM customer GROUP BY 1""",
    "q_avg_first" -> """
      SELECT l_returnflag,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        strftime(min(CAST(l_shipdate AS DATE)), '%Y-%m-%d') AS first_ship, count(*) AS n
      FROM lineitem GROUP BY 1""",
    "q_dedup" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority, year(o_orderdate) AS order_year
      FROM orders""",
    "q_quality_counts" -> Tables.names
      .map(t => s"SELECT '$t' AS tbl, count(*) AS cnt FROM $t")
      .mkString(" UNION ALL "),
    "q_join_recombine" -> s"""
      SELECT a.c_nationkey AS c_nationkey, a.n_cust, a.total_bal,
        ${Segments.map(v => s"p.\"$v\" AS \"$v\"").mkString(", ")}
      FROM (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_cust,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
            FROM customer GROUP BY 1) a
      JOIN (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
              ${Segments.map(v => s"CAST(sum(CASE WHEN c_mktsegment = '$v' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS \"$v\"").mkString(", ")}
            FROM customer GROUP BY 1) p
      ON a.c_nationkey = p.c_nationkey""",
    "q_lookup_left" -> """
      SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        COALESCE(t.nation_name, 'Unknown') AS nation_name
      FROM customer LEFT JOIN
        (SELECT n_nationkey,
           array_to_string(list_transform(string_split(lower(n_name), ' '),
             x -> upper(x[1]) || x[2:]), ' ') AS nation_name
         FROM nation WHERE n_nationkey < 15) t
      ON c_nationkey = t.n_nationkey""",
    "q_cond_fix" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        CASE WHEN n_name = 'NATION_0' THEN 'NATION_ZERO'
             WHEN n_name = 'NATION_7' THEN 'LUCKY_NATION'
             ELSE n_name END AS n_name
      FROM nation""",
    "q_fillna" -> """
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        COALESCE(n_supp, 0) AS n_supp, COALESCE(supp_bal, 0.0) AS supp_bal
      FROM nation LEFT JOIN
        (SELECT s_nationkey, count(*) AS n_supp,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal
         FROM supplier GROUP BY 1) s
      ON n_nationkey = s_nationkey""",
    "q_sql_season" -> """
      SELECT DISTINCT month(o_orderdate) AS arrival_month,
        CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'winter'
             WHEN month(o_orderdate) IN (3, 4, 5) THEN 'spring'
             WHEN month(o_orderdate) IN (6, 8, 7) THEN 'summer'
             ELSE 'autumn' END AS date_season
      FROM orders""",
    "q_rename_drop" -> """
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        l_quantity AS qty, l_extendedprice AS price,
        l_returnflag AS flag, l_linestatus AS status
      FROM lineitem""",
  )
}
