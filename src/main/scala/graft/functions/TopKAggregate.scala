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
  * with the greatest `sortScore` (ties → smallest id), returned as a
  * sort-descending array of `struct<score, id>` where `score` is the
  * carried `payload` (pass the sort key itself for the classic form).
  *
  * The payload channel lets callers rank by a stabilized key (e.g.
  * `round(cos, 9)` for cross-engine FP parity) while emitting the raw
  * value — the window-function equivalent of
  * `row_number().over(orderBy(round(cos,9)))` + projecting `cos`.
  *
  * This is the custom-AGGREGATE tier (`TypedImperativeAggregate`): a
  * window `row_number <= k` shuffles and sorts EVERY row of the group;
  * this aggregate's partial (map-side) buffers never exceed k entries,
  * so only nTasks × k tuples cross the shuffle — the right shape for
  * "top neighbors per query" at corpus scale.
  */
case class TopKByScore(
    sortScore: Expression, payload: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Double, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  // analysis-time typing: int/float inputs are implicitly cast instead
  // of dying with a ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType, LongType)
  override def children: Seq[Expression] = Seq(sortScore, payload, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def prettyName: String = "topk_by_score"

  // ALL score comparisons go through Double.compare (NaN > +Inf >
  // ... > -0.0-after-0.0), matching Spark's SQL sort ordering: a raw
  // `>`/`==` pair is always-false against NaN, so a NaN admitted
  // while the heap was filling would sit at the head and block every
  // later finite candidate (`better(cand, NaN)` never true) — a
  // poisoned heap. Under a total order NaN simply ranks best, exactly
  // where row_number().over(orderBy(desc)) would put it.
  // dequeue() must remove the WORST tuple: smallest sort key, then
  // largest id (so smaller ids survive score ties)
  private val evictOrdering: Ordering[(Double, Double, Long)] =
    new Ordering[(Double, Double, Long)] {
      override def compare(a: (Double, Double, Long), b: (Double, Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._3, b._3)
      }
    }

  private def better(cand: (Double, Double, Long), worst: (Double, Double, Long)): Boolean = {
    val c = java.lang.Double.compare(cand._1, worst._1)
    c > 0 || (c == 0 && cand._3 < worst._3)
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Double, Long)](evictOrdering)

  override def update(buf: mutable.PriorityQueue[(Double, Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Double, Long)] = {
    val s = sortScore.eval(input)
    val p = payload.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val cand = (s.asInstanceOf[Double],
        if (p == null) s.asInstanceOf[Double] else p.asInstanceOf[Double],
        i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(cand)
      else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Double, Long)],
      other: mutable.PriorityQueue[(Double, Double, Long)]): mutable.PriorityQueue[(Double, Double, Long)] = {
    other.foreach { cand =>
      if (buf.size < k) buf.enqueue(cand)
      else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Double, Long)]): Any = {
    val sorted = buf.toSeq.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._3 < b._3)
    }
    new GenericArrayData(sorted.map(t => InternalRow(t._2, t._3)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p, i) =>
      out.writeDouble(s); out.writeDouble(p); out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ =>
      buf.enqueue((in.readDouble(), in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(sortScore = newChildren(0), payload = newChildren(1), id = newChildren(2))
}

/** Bounded-heap top-k with a STRING tie-break and an arbitrary struct
  * payload: per group, the k payload rows whose (`sortScore` desc,
  * `tieId` asc) rank is highest, returned as a rank-ordered
  * `array<struct>` of the payload. The string-keyed sibling of
  * [[TopKByScore]] for rankings whose natural tie-break is a term or
  * name rather than a numeric id (t11's per-doc TF-IDF terms): the
  * window-function equivalent — `row_number().over(partitionBy(g)
  * .orderBy(score.desc, term.asc)) <= k` — sorts EVERY row of every
  * group through a shuffle; these partial buffers never exceed k rows.
  */
case class TopKRowsByScore(
    sortScore: Expression, tieId: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, org.apache.spark.unsafe.types.UTF8String, InternalRow)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, "k must be positive")
  private def payloadSchema: StructType = payload.dataType.asInstanceOf[StructType]

  override def inputTypes: Seq[DataType] = Seq(DoubleType, StringType, payload.dataType)
  override def children: Seq[Expression] = Seq(sortScore, tieId, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payloadSchema)
  override def prettyName: String = "topk_rows_by_score"

  // dequeue() must remove the WORST tuple: smallest sort key, then
  // largest tie string (so lexicographically-smaller ties survive)
  private val evictOrdering: Ordering[(Double, UTF8String, InternalRow)] =
    new Ordering[(Double, UTF8String, InternalRow)] {
      override def compare(a: (Double, UTF8String, InternalRow),
          b: (Double, UTF8String, InternalRow)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  // Double.compare, not raw `>`/`==`: NaN must stay inside the total
  // order (ranked best, as Spark's desc sort would) or a NaN heap
  // head blocks every later candidate — see TopKByScore
  private def better(cand: (Double, UTF8String, InternalRow),
      worst: (Double, UTF8String, InternalRow)): Boolean = {
    val c = java.lang.Double.compare(cand._1, worst._1)
    c > 0 || (c == 0 && cand._2.compareTo(worst._2) < 0)
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String, InternalRow)] =
    mutable.PriorityQueue.empty(evictOrdering)

  override def update(buf: mutable.PriorityQueue[(Double, UTF8String, InternalRow)],
      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String, InternalRow)] = {
    val s = sortScore.eval(input)
    val t = tieId.eval(input)
    if (s != null && t != null) {
      val score = s.asInstanceOf[Double]
      val tie = t.asInstanceOf[UTF8String]
      val full = buf.size >= k
      if (!full || better((score, tie, null), buf.head)) {
        // copy only survivors — and deep-copy them: the struct eval
        // of column references yields rows whose string fields are
        // slices of the operator's REUSED input buffer (and
        // GenericInternalRow.copy() is shallow), so project to an
        // owned UnsafeRow instead
        val row = payload.eval(input).asInstanceOf[InternalRow]
        if (full) buf.dequeue()
        buf.enqueue((score, tie.clone(),
          if (row == null) null else payloadProj(row).copy()))
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, UTF8String, InternalRow)],
      other: mutable.PriorityQueue[(Double, UTF8String, InternalRow)]): mutable.PriorityQueue[(Double, UTF8String, InternalRow)] = {
    other.foreach { cand =>
      if (buf.size < k) buf.enqueue(cand)
      else if (better(cand, buf.head)) { buf.dequeue(); buf.enqueue(cand) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String, InternalRow)]): Any = {
    val sorted = buf.toSeq.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2.compareTo(b._2) < 0)
    }
    new GenericArrayData(sorted.map(_._3))
  }

  @transient private lazy val payloadProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(payloadSchema)

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String, InternalRow)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, t, row) =>
      out.writeDouble(s)
      val tb = t.getBytes
      out.writeInt(tb.length); out.write(tb)
      if (row == null) out.writeInt(-1)
      else {
        // update()/deserialize() store owned UnsafeRows — reuse their
        // bytes; re-project only a foreign row shape
        val rb = row match {
          case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow => u.getBytes
          case other => payloadProj(other).getBytes
        }
        out.writeInt(rb.length); out.write(rb)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String, InternalRow)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val tb = new Array[Byte](in.readInt()); in.readFully(tb)
      val rl = in.readInt()
      val row = if (rl < 0) null else {
        val rb = new Array[Byte](rl); in.readFully(rb)
        val ur = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(payloadSchema.length)
        ur.pointTo(rb, rl)
        ur
      }
      buf.enqueue((s, UTF8String.fromBytes(tb), row))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsByScore =
    copy(sortScore = newChildren(0), tieId = newChildren(1), payload = newChildren(2))
}

object TopKAggregate {
  /** Column API: `topkByScore(cosine, neighborId, 5)` → array<struct>. */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    topkByScore(score, score, id, k)

  /** Rank payload rows by (`sortScore` desc, `tieId` asc); emit the k
    * best payload structs in rank order. */
  def topkRows(sortScore: Column, tieId: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKRowsByScore(GraftColumnBridge.expression(sortScore),
        GraftColumnBridge.expression(tieId),
        GraftColumnBridge.expression(payload), k).toAggregateExpression())

  /** Rank by `sortScore`, emit `payload` as the struct's score field. */
  def topkByScore(sortScore: Column, payload: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(GraftColumnBridge.expression(sortScore),
        GraftColumnBridge.expression(payload),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
