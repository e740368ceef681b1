package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection: print the AQE-final physical plan of named
  * queries. Usage:
  *   sbt "runMain graft.Explain <sfDir> q_name1,q_name2[,...]"
  * Complements [[Plans]] (the checked-in annotated headline set) for
  * iterating on a single query's shape.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q_cast_project")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"========= $q =========")
      val df = SparkEntry.queries(q)(spark, sfDir)
      // execute through THIS queryExecution so the printed plan is the
      // AQE-final one (a separate write() action would re-plan fresh)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreach(_ => ())
      val secs = (System.nanoTime() - t0) / 1e9
      println(df.queryExecution.executedPlan.toString)
      println(f"[$q executed in $secs%.2f s]")
    }
    spark.stop()
  }
}
