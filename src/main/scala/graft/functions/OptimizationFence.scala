package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that REPORTS itself non-deterministic so the
  * optimizer will not substitute-and-push predicates through the
  * projection that defines it.
  *
  * Why it exists: filter pushdown inlines a predicate's referenced
  * column by its DEFINING expression. For an expensive column (d4's
  * exact-Jaccard: `array_intersect`/`array_union` over shingle sets) a
  * downstream threshold filter gets folded INTO the blocked self-join's
  * condition, where Spark evaluates conjuncts in combined order — the
  * expensive predicate lands FIRST, so it runs on every raw
  * (lang, band) probe match (~3.5× the surviving pair count; measured
  * 3× wall-clock on d6's edge build) and then again in the output
  * projection. Fencing the column keeps the filter ABOVE the project:
  * the value is computed once per candidate pair that already passed
  * the cheap band/length/id conjuncts.
  *
  * The value is genuinely deterministic — only the optimizer's view
  * changes — so fenced columns are safe in results and oracles. Do
  * not use a fenced column as a join/group key or window order (the
  * analyzer rejects non-deterministic expressions there); it is meant
  * for expensive PROJECTED measures that downstream code filters on.
  */
case class OptimizationFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "opt_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizationFence =
    copy(child = newChild)
}

object OptimizationFence {
  /** Column API: `fence(expensiveCol)` — see [[OptimizationFence]]. */
  def fence(c: Column): Column =
    GraftColumnBridge.column(OptimizationFence(GraftColumnBridge.expression(c)))
}
