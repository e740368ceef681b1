package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DateFns, TitleCase}
import graft.operators._
import graft.sources.RefSchemas

/** The reference's three ETL pipelines (etl.py:146-396) re-expressed
  * Spark-first: same outputs, but every Python UDF replaced by a native
  * expression (plans stay whole-stage-codegen'd end to end), explicit
  * schemas instead of inferSchema (one scan, not two), single-pass pivot,
  * and broadcast lookup joins.
  */
object Pipelines {

  val Races: Seq[String] = Seq(
    "Hispanic or Latino", "White", "Asian",
    "Black or African-American", "American Indian and Alaska Native")

  /** process_demographics_data (etl.py:146-221): per-city stats dedup +
    * race pivot, recombined.
    */
  def demographics(spark: SparkSession, csvPath: String): DataFrame = {
    val raw = RefSchemas.readDemographics(spark, csvPath)
    val typed = ColumnOps.castColumns(raw, Seq(
      "Median Age" -> "double", "Male Population" -> "int",
      "Female Population" -> "int", "Total Population" -> "int",
      "Number of Veterans" -> "int", "Foreign-born" -> "int",
      "Average Household Size" -> "double", "Count" -> "int"))

    val keys = Seq("City", "State", "State Code")
    // Reference uses first() (etl.py:169-180); stats are constant within a
    // city group so first is value-deterministic — expressed as min_by on
    // the Race column for a stable pick.
    val stats = Aggregates.firstAgg(typed, keys, col("Race"), Seq(
      "Median Age", "Male Population", "Female Population", "Total Population",
      "Number of Veterans", "Foreign-born", "Average Household Size"))

    val pivoted = Aggregates.pivotAgg(typed, keys, "Race", Races, sum(col("Count")))

    val joined = Joins.recombineInner(stats, pivoted, keys)
    val renamed = ColumnOps.renameAll(joined, Map(
      "Median Age" -> "MedianAge", "Male Population" -> "MalePopulation",
      "Female Population" -> "FemalePopulation", "Total Population" -> "TotalPopulation",
      "Number of Veterans" -> "NumberVeterans", "Foreign-born" -> "ForeignBorn",
      "Average Household Size" -> "AverageHouseholdSize", "State Code" -> "StateCode",
      "Hispanic or Latino" -> "HispanicOrLatino",
      "Black or African-American" -> "BlackOrAfricanAmerican",
      "American Indian and Alaska Native" -> "AmericanIndianAndAlaskaNative"))

    ColumnOps.fillZeros(renamed, Seq(
      "MedianAge", "MalePopulation", "FemalePopulation", "TotalPopulation",
      "NumberVeterans", "ForeignBorn", "AverageHouseholdSize",
      "HispanicOrLatino", "White", "Asian", "BlackOrAfricanAmerican",
      "AmericanIndianAndAlaskaNative"))
  }

  /** process_immigration_data branch A (etl.py:224-273): the fact table —
    * int casts, SAS-date conversion (native, replacing convert_sas_udf),
    * column drops, stay = depdate - arrdate (replacing date_diff_udf).
    */
  def immigrationFact(spark: SparkSession, parquetPath: String): DataFrame = {
    val raw = RefSchemas.readImmigration(spark, parquetPath)
    val intCols = Seq("cicid", "i94yr", "i94mon", "i94cit", "i94res", "i94mode",
      "i94bir", "i94visa", "count", "biryear", "dtadfile", "arrdate", "depdate")
    val typed = ColumnOps.castColumns(raw, intCols.map(_ -> "int"))
    typed
      .withColumn("arrdate", DateFns.sasDateStr(col("arrdate")))
      .withColumn("depdate", DateFns.sasDateStr(col("depdate")))
      .drop("visapost", "occup", "entdepu", "insnum",
        "count", "entdepa", "entdepd", "matflag", "dtaddto", "biryear", "admnum")
      .withColumn("stay",
        DateFns.stayDays(to_date(col("arrdate")), to_date(col("depdate"))).cast("int"))
  }

  /** process_immigration_data branch B (etl.py:276-336): the arrival-date
    * dimension — 10-col projection, dedup, native get_date_udf
    * replacement (0 -> null falsy guard), calendar parts, season via the
    * SQL front-end, ready for a year/month-partitioned write.
    */
  def arrivalDate(spark: SparkSession, parquetPath: String): DataFrame = {
    val raw = RefSchemas.readImmigration(spark, parquetPath)
    val projected = raw.select(
      col("i94res").cast("int"), col("i94port"), col("arrdate").cast("int"),
      col("i94mode").cast("int"), col("depdate").cast("int"), col("i94visa").cast("int"),
      col("entdepa"), col("entdepd"), col("biryear").cast("int"), col("admnum").cast("long"))
      .dropDuplicates()

    val dated = projected
      .withColumn("arrival_date", DateFns.sasDateZeroNull(col("arrdate")))
      .select(
        col("arrdate").as("arrival_sasdate"),
        col("arrival_date").as("arrival_iso_date"),
        month(col("arrival_date")).as("arrival_month"),
        year(col("arrival_date")).as("arrival_year"),
        dayofmonth(col("arrival_date")).as("arrival_day"),
        dayofweek(col("arrival_date")).as("day_of_week"),
        weekofyear(col("arrival_date")).as("arrival_weekofyear"))
      .dropDuplicates()

    dated.createOrReplaceTempView("arrival_date")
    spark.sql("""
      SELECT arrival_sasdate, arrival_iso_date, arrival_month, arrival_year,
             arrival_day, day_of_week, arrival_weekofyear,
        CASE WHEN arrival_month IN (12, 1, 2) THEN 'winter'
             WHEN arrival_month IN (3, 4, 5) THEN 'spring'
             WHEN arrival_month IN (6, 7, 8) THEN 'summer'
             ELSE 'autumn' END AS date_season
      FROM arrival_date""")
  }

  /** process_countries_data (etl.py:338-396): country temperature rollup
    * ⟕-joined onto the code lookup, with name fix-ups and a titlecase
    * null-patch (native, replacing capitalize_udf).
    */
  def countries(spark: SparkSession, temperaturesCsv: String, lookupCsv: String): DataFrame = {
    val temps = RefSchemas.readTemperatures(spark, temperaturesCsv)
    val byCountry = temps.groupBy(col("Country"))
      .agg(
        avg(col("AverageTemperature")).as("Temperature"),
        Aggregates.firstBy(col("Latitude"), col("dt")).as("Latitude"),
        Aggregates.firstBy(col("Longitude"), col("dt")).as("Longitude"))
    val fixedTemps = ColumnOps.conditionalReplace(byCountry, "Country", Seq(
        "Congo (Democratic Republic Of The)" -> "Congo",
        "Côte D'Ivoire" -> "Ivory Coast"))
      .withColumn("CountryLower", lower(col("Country")))

    val lookup = RefSchemas.readCountryLookup(spark, lookupCsv)
    val fixedLookup = ColumnOps.conditionalReplace(lookup, "I94CTRY", Seq(
        "BOSNIA-HERZEGOVINA" -> "BOSNIA AND HERZEGOVINA",
        "INVALID: CANADA" -> "CANADA",
        "CHINA, PRC" -> "CHINA",
        "GUINEA-BISSAU" -> "GUINEA BISSAU",
        "INVALID: PUERTO RICO" -> "PUERTO RICO",
        "INVALID: UNITED STATES" -> "UNITED STATES"))
      .withColumn("resCountry_Lower", lower(col("I94CTRY")))

    val joined = Joins.lookupLeft(fixedLookup, fixedTemps,
      col("resCountry_Lower") === col("CountryLower"))
    ColumnOps.coalescePatch(joined, "Country", TitleCase.titlecase(lower(col("I94CTRY"))))
      .drop("CountryLower", "resCountry_Lower", "I94CTRY")
  }

  /** Partitioned parquet sink (etl.py:336, K2) — fixed to a well-formed
    * URI (the reference concatenated two roots; SURVEY.md §7.4).
    */
  def writePartitionedByArrival(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .partitionBy("arrival_year", "arrival_month").parquet(path)

  /** Plain parquet sink (etl.py:221,273,396, K1). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
