package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode => LogicalBinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native sort-merge AS-OF JOIN — the whole-operator custom-plan tier
  * (logical node + strategy + physical exec), for semantics Spark's
  * built-in operators can't express EFFICIENTLY.
  *
  * [[graft.operators.Olap.asofJoin]] composes an equi-join with a
  * top-1 window: correct, but it materializes every
  * (left row × earlier right row) pair before the window discards all
  * but one — O(left × right-per-key) rows through the shuffle. At
  * 100 TB that intermediate dwarfs both inputs. This operator instead
  * requires both sides hash-clustered on the key and sorted by
  * (key, time), then streams a single forward merge per partition:
  * O(left + right) rows, no intermediate blow-up, one shuffle per side
  * (none if the tables are bucketed on the key).
  *
  * Semantics (matching the window form): for each left row, the right
  * row with the greatest (rightTime, tieBreak) such that
  * rightKey == leftKey and rightTime <= leftTime; left-outer (nulls
  * when no prior right row). Keys must be integral, times
  * timestamp/integral (both surface as Long internally).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tieBreak: Expression)
  extends LogicalBinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tieBreak: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(tieBreak, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output
    val leftAttrs = left.output
    // bind as nullable: the outer-join null row must survive the
    // projection (non-nullable BoundReferences skip the null check)
    val rightAttrs = right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(schema, leftAttrs ++ rightAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      var heldRow: InternalRow = null
      var heldKey: Long = 0L
      def asLong(v: Any): Long = v match {
        case null => Long.MinValue
        case l: Long => l
        case i: Int => i.toLong
        case n: Number => n.longValue()
      }
      lIt.map { lRow =>
        val kRaw = lkB.eval(lRow)
        if (kRaw == null) {
          // SQL join semantics: a null key matches nothing
          proj(joined(lRow, nullRight))
        } else {
        val k = asLong(kRaw)
        val t = asLong(ltB.eval(lRow))
        // advance the right side up to (key, time<=t); the LAST row
        // consumed for this key is the as-of match (sorted by
        // time, tieBreak ascending)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val hkRaw = rkB.eval(head)
          val htRaw = rtB.eval(head)
          val hk = asLong(hkRaw)
          val ht = asLong(htRaw)
          if (hk < k || (hk == k && ht <= t)) {
            val r = rBuf.next()
            // null key/time rows are consumed (they sort first) but
            // never held — an unknown time cannot be an as-of match
            if (hk == k && hkRaw != null && htRaw != null) {
              heldRow = r.copy(); heldKey = k
            }
          } else advancing = false
        }
        val matched = heldRow != null && heldKey == k
        proj(joined(lRow, if (matched) heldRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Registers the strategy (idempotent) and builds the as-of join.
    * Columns are named on each side; output = left columns ++ right
    * columns (right nullable).
    */
  def asofJoinNative(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String, leftTime: String, rightTime: String,
      tieBreak: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val plan = AsOfJoinPlan(
      GraftColumnBridge.analyzedPlan(leftDf),
      GraftColumnBridge.analyzedPlan(rightDf),
      GraftColumnBridge.expression(leftDf(leftKey)),
      GraftColumnBridge.expression(rightDf(rightKey)),
      GraftColumnBridge.expression(leftDf(leftTime)),
      GraftColumnBridge.expression(rightDf(rightTime)),
      GraftColumnBridge.expression(rightDf(tieBreak)))
    GraftColumnBridge.dataFrame(spark, plan)
  }
}
