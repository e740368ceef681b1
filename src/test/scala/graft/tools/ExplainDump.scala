package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for a set of declared queries into
  * per-query files — the before/after plan evidence an optimization
  * round commits (plans/r16/<query>_<tag>.txt). Unlike [[graft.Plans]]
  * (the curated PLANS.md), this takes ANY declared query name, so a
  * round can capture exactly the plans it touched.
  *
  * Usage: Test/runMain graft.tools.ExplainDump <outDir> <tag> <q1,q2,...>
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <q1,q2,...>")
    val outDir = args(0); val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
