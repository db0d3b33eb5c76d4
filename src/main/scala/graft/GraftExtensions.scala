package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductExpr

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Activate cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or per session
  * via `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "vector_dot"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1))))
  }
}

/** Imperative twin of [[GraftExtensions]] for sessions that are
  * already built (tests, the driver contract mains).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "vector_dot",
      exprs => DotProductExpr(exprs.head, exprs(1)))
}
