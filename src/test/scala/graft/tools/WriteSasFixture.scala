package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes the reference parquet mirror out as a sas7bdat file for the
  * pandas cross-read gate (tools/check_sas7bdat_pandas.py — pandas is
  * an independent implementation of the same public spec).
  *
  * Usage: Test/runMain graft.tools.WriteSasFixture <parquetDir> <outFile> [codec|raw]
  */
object WriteSasFixture {
  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val codec = args.lift(2).getOrElse("raw")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(src)
    graft.sources.Sas7bdat.writeDataFrame(df, out, datasetName = "I94_APR16",
      compress = codec != "raw",
      codec = if (codec == "raw") "SASYZCRL" else codec)
    println(s"SAS_FIXTURE wrote $out codec=$codec rows=${df.count()}")
    spark.stop()
  }
}
