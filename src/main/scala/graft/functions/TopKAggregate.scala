package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: per group, the k (score, id) pairs
  * with the greatest score (ties → smallest id), returned as a
  * score-descending array of structs.
  *
  * This is the custom-AGGREGATE tier (`TypedImperativeAggregate`): a
  * window `row_number <= k` shuffles and sorts EVERY row of the group;
  * this aggregate's partial (map-side) buffers never exceed k entries,
  * so only nTasks × k pairs cross the shuffle — the right shape for
  * "top neighbors per query" at corpus scale.
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  // analysis-time typing: int/float inputs are implicitly cast instead
  // of dying with a ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "topk_by_score"

  // dequeue() must remove the WORST pair: smallest score, then
  // largest id (so smaller ids survive score ties)
  private val evictOrdering: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](evictOrdering)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val cand = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(cand)
      else {
        val worst = buf.head
        if (cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)) {
          buf.dequeue(); buf.enqueue(cand)
        }
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { cand =>
      if (buf.size < k) buf.enqueue(cand)
      else {
        val worst = buf.head
        if (cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)) {
          buf.dequeue(); buf.enqueue(cand)
        }
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map(t => InternalRow(t._1, t._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggregate {
  /** Column API: `topkByScore(cosine, neighborId, 5)` → array<struct>. */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
