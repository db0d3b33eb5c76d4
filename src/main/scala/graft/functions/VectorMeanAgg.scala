package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise FIXED-POINT MEAN of an `array<double>` column — the
  * k-means centroid-update aggregate.
  *
  * The compositional plan for a per-cluster mean vector is
  * `posexplode(v)` → `avg` by (cluster, position) → `collect_list` +
  * `array_sort` back into arrays: a dim× row amplification through
  * the first hash aggregate, then a SECOND shuffle just to
  * re-assemble positions into an array. This aggregate does it in one
  * pass with one exchange: the buffer is (running sum vector, count),
  * update adds a vector element-wise, merge adds buffers, eval emits
  * sums/count. Map-side partials mean the exchange carries one
  * (cluster, dim-array) row per task per cluster — no position rows,
  * no re-assembly, no sort.
  *
  * FIXED-POINT, not float: each element is quantized to integer
  * MICROS (`floor(x·1e6 + 0.5)` — floor-based so both engines and
  * both signs agree) and summed as a Long. Integer addition commutes,
  * so the centroid is BIT-IDENTICAL at any partitioning — a float
  * buffer made centroid bits depend on Spark's partial-aggregation
  * order, i.e. on cluster size and task scheduling, which (a) broke
  * run-to-run determinism at scale and (b) made the k-means regime
  * impossible for an external SQL oracle to re-derive. The result is
  * `(Σ micros) / count / 1e6` (two IEEE divisions in fixed order);
  * the ≤5e-7 per-element quantization offset is far below any
  * k-means assignment scale and is exactly re-derivable in DuckDB —
  * what flips s3/s8/s11 from rows-only to exact oracles. Overflow
  * headroom: |x| < 9e12 fits 2⁶³ micros even summed over 1e6 rows;
  * embedding components are O(1).
  *
  * Mixed-dimension input follows the compositional plan's semantics:
  * each position averages over the vectors that HAVE that position
  * (per-position counts), so a stray short vector degrades exactly
  * like the posexplode form, not silently.
  */
case class VectorMeanAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanAgg.Buf]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_mean"

  override def createAggregationBuffer(): VectorMeanAgg.Buf = new VectorMeanAgg.Buf

  override def update(buf: VectorMeanAgg.Buf, input: InternalRow): VectorMeanAgg.Buf = {
    val a = child.eval(input)
    if (a != null) buf.add(a.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VectorMeanAgg.Buf, other: VectorMeanAgg.Buf): VectorMeanAgg.Buf = {
    buf.merge(other)
    buf
  }

  override def eval(buf: VectorMeanAgg.Buf): Any = buf.result()

  override def serialize(buf: VectorMeanAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val d = if (buf.sums == null) 0 else buf.sums.length
    out.writeInt(d)
    var i = 0
    while (i < d) { out.writeLong(buf.sums(i)); out.writeLong(buf.counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new VectorMeanAgg.Buf
    if (d > 0) {
      buf.sums = new Array[Long](d)
      buf.counts = new Array[Long](d)
      var i = 0
      while (i < d) { buf.sums(i) = in.readLong(); buf.counts(i) = in.readLong(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMeanAgg =
    copy(child = newChildren(0))
}

object VectorMeanAgg {

  /** Quantize one element to integer micros — floor-based half-up so
    * Scala and any SQL engine agree for BOTH signs (Scala's
    * `math.round`/SQL `ROUND` half-up conventions diverge on
    * negatives; `floor(x·1e6 + 0.5)` does not). */
  @inline def micros(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** Running (per-position micro sum, per-position count). `sums`
    * stays null until the first non-null vector fixes the dimension; a
    * longer vector later grows the buffer (positions it alone carries
    * average over count 1 — the posexplode semantics).
    */
  final class Buf {
    var sums: Array[Long] = _
    var counts: Array[Long] = _

    private def grow(d: Int): Unit = {
      if (sums == null) { sums = new Array[Long](d); counts = new Array[Long](d) }
      else if (d > sums.length) {
        sums = java.util.Arrays.copyOf(sums, d)
        counts = java.util.Arrays.copyOf(counts, d)
      }
    }

    def add(a: ArrayData): Unit = {
      val d = a.numElements()
      grow(d)
      var i = 0
      while (i < d) {
        if (!a.isNullAt(i)) { sums(i) += micros(a.getDouble(i)); counts(i) += 1L }
        i += 1
      }
    }

    def merge(o: Buf): Unit = {
      if (o.sums != null) {
        grow(o.sums.length)
        var i = 0
        while (i < o.sums.length) { sums(i) += o.sums(i); counts(i) += o.counts(i); i += 1 }
      }
    }

    def result(): Any = {
      if (sums == null) null
      else {
        val out = new Array[Double](sums.length)
        var i = 0
        while (i < sums.length) {
          out(i) = if (counts(i) > 0) sums(i).toDouble / counts(i) / 1e6 else 0.0
          i += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  /** Column facade (aggregate): element-wise fixed-point mean of
    * `array<double>`. */
  def vectorMean(v: Column): Column = GraftColumnBridge.column(
    VectorMeanAgg(GraftColumnBridge.expression(v)).toAggregateExpression())
}
