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
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy hitters: per group, a bounded summary of the
  * `capacity` most frequent string items, as a (count desc, item asc)
  * sorted `array<struct<item, count, err>>` with per-item error
  * bounds — `count − err ≤ true ≤ count`.
  *
  * The 100 TB shape this exists for: "top domains / tokens / user
  * agents" over a column whose distinct count does NOT fit a groupBy —
  * an exact count shuffles the full key domain; this aggregate's
  * partial (map-side) buffers never exceed `capacity` entries, so only
  * nTasks × capacity tuples cross the shuffle, whatever the domain
  * size. SpaceSaving's guarantee (Metwally et al., ICDT 2005): any
  * item with true frequency > N/capacity is IN the summary, and every
  * reported count overestimates by at most its `err`.
  *
  * Merge is the Agarwal et al. (TODS 2013) summary merge: counts of
  * co-present items add; an item absent from one side inherits that
  * side's minimum counter as both count and error contribution (the
  * tightest sound bound on what the absent side might have seen);
  * the combined map then truncates back to `capacity` by count.
  *
  * Determinism contract: when `capacity ≥ ` the column's distinct
  * count nothing ever evicts or truncates, every `err` is 0, counts
  * are EXACT, and the result is merge-order-independent — the
  * registry entry runs in that regime so DuckDB can oracle it with a
  * plain GROUP BY. Below that, counts depend on partition merge order
  * (inherent to all mergeable heavy-hitter summaries) but the bounds
  * above always hold — the spec exercises that regime on a skewed
  * fixture.
  */
case class FrequentItems(
    item: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, (Long, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(capacity > 0, "capacity must be positive")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType),
    StructField("err", LongType))))
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, (Long, Long)] =
    mutable.HashMap.empty

  // deterministic victim under count ties: largest item string (so
  // lexicographically-smaller items survive, mirroring the output
  // sort's tie-break)
  private def minEntry(buf: mutable.HashMap[UTF8String, (Long, Long)]): (UTF8String, (Long, Long)) = {
    var best: (UTF8String, (Long, Long)) = null
    buf.foreach { e =>
      if (best == null) best = e
      else {
        val c = java.lang.Long.compare(e._2._1, best._2._1)
        if (c < 0 || (c == 0 && e._1.compareTo(best._1) > 0)) best = e
      }
    }
    best
  }

  override def update(buf: mutable.HashMap[UTF8String, (Long, Long)],
      input: InternalRow): mutable.HashMap[UTF8String, (Long, Long)] = {
    val v = item.eval(input)
    if (v != null) {
      val it = v.asInstanceOf[UTF8String]
      buf.get(it) match {
        case Some((c, e)) => buf.update(it, (c + 1, e))
        case None if buf.size < capacity => buf.update(it.clone(), (1L, 0L))
        case None =>
          // SpaceSaving eviction: the new item takes over the minimum
          // counter — count = min+1, err = min (it may have occurred
          // up to min times while untracked)
          val (victim, (mc, _)) = minEntry(buf)
          buf.remove(victim)
          buf.update(it.clone(), (mc + 1, mc))
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, (Long, Long)],
      other: mutable.HashMap[UTF8String, (Long, Long)]): mutable.HashMap[UTF8String, (Long, Long)] = {
    // a side's minimum counter bounds what it may have seen of an
    // item it is NOT tracking; a side that never filled up saw ≤ 0
    // of any untracked item
    val minBuf = if (buf.size < capacity) 0L else buf.valuesIterator.map(_._1).min
    val minOther = if (other.size < capacity) 0L else other.valuesIterator.map(_._1).min
    val merged = mutable.HashMap.empty[UTF8String, (Long, Long)]
    (buf.keysIterator ++ other.keysIterator).foreach { it =>
      if (!merged.contains(it)) {
        val (ca, ea) = buf.getOrElse(it, (minBuf, minBuf))
        val (cb, eb) = other.getOrElse(it, (minOther, minOther))
        merged.update(it, (ca + cb, ea + eb))
      }
    }
    buf.clear()
    if (merged.size <= capacity) buf ++= merged
    else {
      // keep the capacity largest counts (ties → smaller item string)
      merged.toSeq.sortWith { case ((ia, (ca, _)), (ib, (cb, _))) =>
        ca > cb || (ca == cb && ia.compareTo(ib) < 0)
      }.take(capacity).foreach { case (it, ce) => buf.update(it, ce) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, (Long, Long)]): Any = {
    val sorted = buf.toSeq.sortWith { case ((ia, (ca, _)), (ib, (cb, _))) =>
      ca > cb || (ca == cb && ia.compareTo(ib) < 0)
    }
    new GenericArrayData(sorted.map { case (it, (c, e)) => InternalRow(it, c, e) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, (c, e)) =>
      val b = it.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(item = newChildren(0))
}

object FrequentItemsAggregate {
  /** Bounded-memory heavy hitters over a string column. */
  def frequentItems(item: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      FrequentItems(GraftColumnBridge.expression(item), capacity)
        .toAggregateExpression())
}
