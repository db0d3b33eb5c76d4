package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) DISTINCT sketch — the
  * approximate-distinct family's DETERMINISTIC member (h12).
  *
  * Where HLL's register layout is engine-private (h8/q20 are pinned
  * by committed digests), KMV's entire state is "the k smallest
  * distinct hash values", and bottom-k of a UNION is bottom-k of the
  * per-partition bottom-ks regardless of merge order or partitioning
  * — so the sketch is bit-stable at any parallelism AND an external
  * SQL engine re-derives it from scratch: per group, hash the
  * distinct keys, take the k-th smallest, estimate
  * `(k−1)·M / h_k` (exact count below k). Standard estimator
  * (Bar-Yossef et al.), error ~1/√k; mergeability gives the same
  * map-side-combine scale story as HLL with a fixed 8k-byte state.
  *
  * The hash is a bijection on [0, 2³¹) — LCG ∘ xorshift ∘ LCG, all
  * integer ops DuckDB mirrors verbatim — so distinct keys can never
  * collide (KMV's distinctness bookkeeping is exact) and the
  * estimator sees the three-distance equidistribution of an affine
  * orbit broken up by the xorshift.
  */
object KmvSketch {

  val M: Long = 2147483648L // 2^31, the hash modulus

  /** The deterministic 31-bit hash, as a Column (pure integer
    * arithmetic — the oracle recomputes it in SQL verbatim). */
  def kmvHash(key: Column): Column = {
    val h1 = pmod(lit(1103515245L) * key + lit(12345L), lit(M))
    val h2 = h1.bitwiseXOR(shiftrightunsigned(h1, 13))
    pmod(lit(1103515245L) * h2 + lit(12345L), lit(M))
  }

  /** Estimate from a (sorted ascending) bottom-k array: exact size
    * below k, else `(k−1)·M / h_k` rounded half-up. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * M.toDouble)
        / element_at(sk, k).cast("double") + lit(0.5)).cast("long"))

  /** Build aggregate: bottom-`k` distinct hashed longs → sorted
    * `array<long>`. */
  def kmvSketch(hashed: Column, k: Int): Column = GraftColumnBridge.column(
    BottomKLongsAgg(GraftColumnBridge.expression(hashed), k).toAggregateExpression())

  /** Merge aggregate: union of bottom-k arrays → bottom-k. */
  def kmvUnion(sketch: Column, k: Int): Column = GraftColumnBridge.column(
    BottomKUnionAgg(GraftColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Bounded sorted-distinct buffer: at most k smallest longs. Linear
    * insertion — k is a small constant (64) and the buffer lives in
    * the aggregation hash map, so simplicity beats a heap here. */
  final class Buf(k: Int) {
    val vals = new Array[Long](k)
    var n = 0

    def add(x: Long): Unit = {
      // find insertion point (first index with vals(i) >= x)
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (vals(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < n && vals(lo) == x) return          // already present
      if (lo >= k) return                          // larger than all k kept
      val last = math.min(n, k - 1)
      var i = last
      while (i > lo) { vals(i) = vals(i - 1); i -= 1 }
      vals(lo) = x
      if (n < k) n += 1
    }

    def merge(o: Buf): Unit = {
      var i = 0
      while (i < o.n) { add(o.vals(i)); i += 1 }
    }

    def result(): GenericArrayData =
      new GenericArrayData(java.util.Arrays.copyOf(vals, n))
  }

  private[graft] def writeBuf(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeLong(buf.vals(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  private[graft] def readBuf(bytes: Array[Byte], k: Int): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(k)
    var i = 0
    // already sorted ascending — add() keeps order
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }
}

/** Bottom-k distinct longs from raw hashed values (the pre-agg-grain
  * build, h12's `hll_sketch_agg` seat). */
case class BottomKLongsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buf]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(k > 0 && k <= 65536, s"k must be in (0, 65536], got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvSketch.Buf = new KmvSketch.Buf(k)
  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf = {
    buf.merge(other); buf
  }
  override def eval(buf: KmvSketch.Buf): Any = buf.result()
  override def serialize(buf: KmvSketch.Buf): Array[Byte] = KmvSketch.writeBuf(buf)
  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
    KmvSketch.readBuf(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): BottomKLongsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKLongsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BottomKLongsAgg = copy(child = c(0))
}

/** Bottom-k over already-built sketch arrays (the lattice merge,
  * h12's `hll_union_agg` seat). */
case class BottomKUnionAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buf]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(k > 0 && k <= 65536, s"k must be in (0, 65536], got $k")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_union"

  override def createAggregationBuffer(): KmvSketch.Buf = new KmvSketch.Buf(k)
  override def update(buf: KmvSketch.Buf, input: InternalRow): KmvSketch.Buf = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { buf.add(arr.getLong(i)); i += 1 }
    }
    buf
  }
  override def merge(buf: KmvSketch.Buf, other: KmvSketch.Buf): KmvSketch.Buf = {
    buf.merge(other); buf
  }
  override def eval(buf: KmvSketch.Buf): Any = buf.result()
  override def serialize(buf: KmvSketch.Buf): Array[Byte] = KmvSketch.writeBuf(buf)
  override def deserialize(bytes: Array[Byte]): KmvSketch.Buf =
    KmvSketch.readBuf(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): BottomKUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BottomKUnionAgg = copy(child = c(0))
}
