package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** EXACT distinct counting over a BOUNDED integer key domain as a
  * bitmap aggregate — the one-pass alternative to the two-phase
  * `count(distinct)` re-shuffle. `count(distinct key)` forces a
  * second exchange at (group, key) grain: at 100 TB that is a
  * fact-sized shuffle whose only purpose is dedup. When the key is a
  * DICTIONARY ID (customer surrogate, product id, user id — domains
  * that grow with the business, not with the event volume), a bitmap
  * buffer turns dedup into bit-set: partials OR together, merges are
  * word-wise and merge-order-independent, map-side combine works, so
  * only nTasks × (domain/8 bytes, sparse-encoded) cross the shuffle
  * and the result is EXACT — the engine-side equivalent of
  * ClickHouse's groupBitmap / Druid's complementing HLL twin (h8's
  * sketch covers the unbounded-domain case; this covers the bounded
  * one with zero error).
  *
  * Memory contract: the dense buffer costs `maxKey/8` bytes per
  * GROUP buffer; `maxKey` is capped at 2^26 (8 MB) and must be sized
  * to the dictionary, not guessed. Serialization auto-picks sparse
  * (set-word index pairs) vs dense, so nearly-empty partials ship
  * small. Null keys are ignored (count-distinct semantics);
  * out-of-domain keys fail loudly — a silent mask would return wrong
  * counts.
  */
case class BitmapDistinct(
    key: Expression, maxKey: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(maxKey >= 0 && maxKey <= (1 << 26),
    s"maxKey $maxKey outside [0, 2^26] — size the bitmap to the key dictionary")

  private val nWords = (maxKey >> 6) + 1

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = key.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      require(k >= 0 && k <= maxKey,
        s"bitmap_distinct key $k outside domain [0, $maxKey]")
      buf((k >> 6).toInt) |= (1L << (k & 63))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < nWords) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var set = 0
    var i = 0
    while (i < nWords) { if (buf(i) != 0L) set += 1; i += 1 }
    if (set * 3 < nWords) { // sparse: (index, word) pairs
      out.writeByte(0)
      out.writeInt(set)
      i = 0
      while (i < nWords) {
        if (buf(i) != 0L) { out.writeInt(i); out.writeLong(buf(i)) }
        i += 1
      }
    } else { // dense
      out.writeByte(1)
      i = 0
      while (i < nWords) { out.writeLong(buf(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    if (in.readByte() == 0) {
      val set = in.readInt()
      var j = 0
      while (j < set) { val i = in.readInt(); buf(i) = in.readLong(); j += 1 }
    } else {
      var i = 0
      while (i < nWords) { buf(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(key = newChildren(0))
}

object BitmapDistinctAggregate {
  /** Exact distinct count of a bounded-domain integer key column. */
  def bitmapDistinct(key: Column, maxKey: Int): Column =
    GraftColumnBridge.column(
      BitmapDistinct(GraftColumnBridge.expression(key), maxKey)
        .toAggregateExpression())
}
