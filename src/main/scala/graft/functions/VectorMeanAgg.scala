package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise MEAN of an `array<double>` column — the k-means
  * centroid-update aggregate.
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
    while (i < d) { out.writeDouble(buf.sums(i)); out.writeLong(buf.counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new VectorMeanAgg.Buf
    if (d > 0) {
      buf.sums = new Array[Double](d)
      buf.counts = new Array[Long](d)
      var i = 0
      while (i < d) { buf.sums(i) = in.readDouble(); buf.counts(i) = in.readLong(); i += 1 }
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

  /** Running (per-position sum, per-position count). `sums` stays null
    * until the first non-null vector fixes the dimension; a longer
    * vector later grows the buffer (positions it alone carries average
    * over count 1 — the posexplode semantics).
    */
  final class Buf {
    var sums: Array[Double] = _
    var counts: Array[Long] = _

    private def grow(d: Int): Unit = {
      if (sums == null) { sums = new Array[Double](d); counts = new Array[Long](d) }
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
        if (!a.isNullAt(i)) { sums(i) += a.getDouble(i); counts(i) += 1L }
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
          out(i) = if (counts(i) > 0) sums(i) / counts(i) else 0.0
          i += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  /** Column facade (aggregate): element-wise mean of `array<double>`. */
  def vectorMean(v: Column): Column = GraftColumnBridge.column(
    VectorMeanAgg(GraftColumnBridge.expression(v)).toAggregateExpression())
}
