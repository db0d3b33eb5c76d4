package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{DotProductExpr, NormSquaredExpr}

/** Optimizer rule: `vector_dot(x, x)` → `norm_sq(x)` — one array
  * traversal instead of two. The (c)-tier `Rule[LogicalPlan]`
  * extension point, injected via [[GraftExtensions]] or
  * `spark.experimental.extraOptimizations`.
  */
object OptimizeSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductExpr(a, b) if a.fastEquals(b) => NormSquaredExpr(a)
    }
}

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
      GraftExtensions.vectorDotBuilder))
    e.injectOptimizerRule(_ => OptimizeSelfDot)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

/** Imperative twin of [[GraftExtensions]] for sessions that are
  * already built (tests, the driver contract mains).
  */
object GraftExtensions {
  /** Arity-checked builder: wrong argument counts surface as an
    * analysis error, not an IndexOutOfBoundsException.
    */
  val vectorDotBuilder: Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> "`vector_dot`",
          "expectedNum" -> "2", "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    DotProductExpr(exprs.head, exprs(1))
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "vector_dot",
      GraftExtensions.vectorDotBuilder)
    if (!spark.experimental.extraOptimizations.contains(OptimizeSelfDot)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ OptimizeSelfDot
    }
  }
}
