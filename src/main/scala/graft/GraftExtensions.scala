package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{PolyHash, TitleCase}

/** Session extension wiring: registers the library's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT titlecase(c) ...")`
  * works alongside the Column API.
  *
  * Use either `.withExtensions(new GraftExtensions)` at session build, or
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("titlecase"),
      new ExpressionInfo(classOf[TitleCase].getName, "titlecase"),
      (children: Seq[Expression]) => TitleCase(children.head)))
    e.injectFunction((FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    e.injectOptimizerRule(_ => graft.plans.CollapseTitleCase)
  }
}

object GraftExtensions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "titlecase", exprs => TitleCase(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "built-in")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.CollapseTitleCase)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.CollapseTitleCase
    }
  }
}
