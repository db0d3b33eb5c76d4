package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) BIT INTERLEAVE of two non-negative keys: bit i of
  * each input lands at output bits 2i / 2i+1, so sorting by the result
  * clusters rows that are close in BOTH dimensions — the layout trick
  * behind multi-column row-group pruning (Delta/Iceberg's OPTIMIZE
  * ZORDER): a parquet file holding a z-range covers a small rectangle
  * of (a, b) space, so min/max footer stats prune scans filtered on
  * EITHER column, where a single-column sort prunes only its own.
  *
  * Inputs must already be scaled to [0, 2^31) (see
  * [[graft.sources.Sources.writeZOrdered]] — linear min/max scaling to
  * `bits` bits); 2 × 31 bits fits a positive long. The loop is a tight
  * codegen'd primitive — no lambda, no allocation.
  */
// ImplicitCastInputTypes (not bare ExpectsInputTypes) so SQL calls
// with INT literals — `interleave_bits(3, 3)` — analyze: the sibling
// numeric expressions accept int inputs, and without the implicit
// cast only 3L literals resolved
case class InterleaveBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBitsExpr.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.InterleaveBitsExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBitsExpr =
    copy(left = newLeft, right = newRight)
}

object InterleaveBitsExpr {

  /** Spread the low 31 bits of x to even positions (0, 2, 4, ...)
    * via the standard Morton magic-number sequence, widened to 64-bit.
    */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def interleaveBits(a: Column, b: Column): Column =
    GraftColumnBridge.column(InterleaveBitsExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
