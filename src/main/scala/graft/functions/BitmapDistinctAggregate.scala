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

  override def serialize(buf: Array[Long]): Array[Byte] =
    BitmapCodec.serialize(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    BitmapCodec.orInto(buf, bytes)
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

/** The shared bitmap wire format: a 1-byte sparse/dense flag, then
  * either (count, (wordIndex, word)*) pairs or the dense word run.
  * Shared by every bitmap aggregate so a bitmap VALUE built by one
  * ([[BitmapBuild]]) can be merged by another ([[BitmapMerge]]) and
  * counted by the scalar [[BitmapCardinality]] — the MV lifecycle.
  */
private[functions] object BitmapCodec {
  def serialize(words: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var set = 0
    var i = 0
    while (i < words.length) { if (words(i) != 0L) set += 1; i += 1 }
    if (set * 3 < words.length) { // sparse: (index, word) pairs
      out.writeByte(0)
      out.writeInt(set)
      i = 0
      while (i < words.length) {
        if (words(i) != 0L) { out.writeInt(i); out.writeLong(words(i)) }
        i += 1
      }
    } else { // dense
      out.writeByte(1)
      i = 0
      while (i < words.length) { out.writeLong(words(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  /** OR a serialized bitmap into `words`; fails loudly if the encoded
    * bitmap is wider than the target domain. */
  def orInto(words: Array[Long], bytes: Array[Byte]): Unit = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    if (in.readByte() == 0) {
      val set = in.readInt()
      var j = 0
      while (j < set) {
        val i = in.readInt()
        require(i < words.length,
          s"bitmap word index $i outside target domain (${words.length} words)")
        words(i) |= in.readLong()
        j += 1
      }
    } else {
      val nw = (bytes.length - 1) / 8
      require(nw <= words.length,
        s"dense bitmap of $nw words wider than target domain (${words.length})")
      var i = 0
      while (i < nw) { words(i) |= in.readLong(); i += 1 }
    }
  }

  def cardinality(bytes: Array[Byte]): Long = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    var n = 0L
    if (in.readByte() == 0) {
      val set = in.readInt()
      var j = 0
      while (j < set) { in.readInt(); n += java.lang.Long.bitCount(in.readLong()); j += 1 }
    } else {
      val nw = (bytes.length - 1) / 8
      var i = 0
      while (i < nw) { n += java.lang.Long.bitCount(in.readLong()); i += 1 }
    }
    n
  }
}

/** [[BitmapDistinct]]'s sibling that emits the bitmap VALUE (binary)
  * instead of its cardinality — the storable form. This is what makes
  * EXACT distinct INCREMENTALLY MAINTAINABLE: a distinct COUNT cannot
  * fold a delta (counts don't decompose over set union), but a stored
  * bitmap can — `new = old OR delta` ([[BitmapMerge]]), then read the
  * count off with [[BitmapCardinality]]. The Druid/ClickHouse
  * bitmap-MV pattern, engine-native.
  */
case class BitmapBuild(
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
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = key.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      require(k >= 0 && k <= maxKey,
        s"bitmap_build key $k outside domain [0, $maxKey]")
      buf((k >> 6).toInt) |= (1L << (k & 63))
    }
    buf
  }
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { buf(i) |= other(i); i += 1 }
    buf
  }
  override def eval(buf: Array[Long]): Any = BitmapCodec.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BitmapCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    BitmapCodec.orInto(buf, bytes)
    buf
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapBuild =
    copy(key = newChildren(0))
}

/** OR-merge serialized bitmap values (binary column → binary) — the
  * MV maintenance step: `groupBy(node).agg(bitmapMerge(bitmap))` over
  * stored + delta bitmap rows yields the updated store. */
case class BitmapMerge(
    bitmap: Expression, maxKey: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(maxKey >= 0 && maxKey <= (1 << 26),
    s"maxKey $maxKey outside [0, 2^26] — size the bitmap to the key dictionary")
  private val nWords = (maxKey >> 6) + 1

  override def children: Seq[Expression] = Seq(bitmap)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_merge"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = bitmap.eval(input)
    if (v != null) BitmapCodec.orInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nWords) { buf(i) |= other(i); i += 1 }
    buf
  }
  override def eval(buf: Array[Long]): Any = BitmapCodec.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BitmapCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = createAggregationBuffer()
    BitmapCodec.orInto(buf, bytes)
    buf
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapMerge =
    copy(bitmap = newChildren(0))
}

/** Scalar popcount over a serialized bitmap — the MV read-off. Runs
  * on MV-grain rows (nodes, not facts), so the CodegenFallback eval
  * is never in a fact-sized hot path. */
case class BitmapCardinality(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_cardinality"
  override protected def nullSafeEval(input: Any): Any =
    BitmapCodec.cardinality(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

object BitmapDistinctAggregate {
  /** Exact distinct count of a bounded-domain integer key column. */
  def bitmapDistinct(key: Column, maxKey: Int): Column =
    GraftColumnBridge.column(
      BitmapDistinct(GraftColumnBridge.expression(key), maxKey)
        .toAggregateExpression())

  /** Build the storable bitmap VALUE of a key column (binary). */
  def bitmapBuild(key: Column, maxKey: Int): Column =
    GraftColumnBridge.column(
      BitmapBuild(GraftColumnBridge.expression(key), maxKey)
        .toAggregateExpression())

  /** OR-merge stored bitmap values. */
  def bitmapMerge(bitmap: Column, maxKey: Int): Column =
    GraftColumnBridge.column(
      BitmapMerge(GraftColumnBridge.expression(bitmap), maxKey)
        .toAggregateExpression())

  /** Scalar popcount of a stored bitmap value. */
  def bitmapCardinality(bitmap: Column): Column =
    GraftColumnBridge.column(
      BitmapCardinality(GraftColumnBridge.expression(bitmap)))
}
