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
      (exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1))))
    e.injectOptimizerRule(_ => OptimizeSelfDot)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

/** Imperative twin of [[GraftExtensions]] for sessions that are
  * already built (tests, the driver contract mains).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, "vector_dot",
      exprs => DotProductExpr(exprs.head, exprs(1)))
    if (!spark.experimental.extraOptimizations.contains(OptimizeSelfDot)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ OptimizeSelfDot
    }
  }
}
