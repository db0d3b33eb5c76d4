package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-membership probe — the explicit form of the runtime
  * pre-filter pattern (what Spark's injected bloom runtime filters do
  * for shuffle joins, here as a first-class operator building block
  * for 100 TB ingest): a driver-built [[BloomFilter]] over the static
  * side's 64-bit keys is shipped to executors once, and the probe is
  * a codegen'd bit-test — rows that can't possibly match never reach
  * the join shuffle.
  *
  * The filter travels as its serialized bytes (a few MB at most for
  * hundreds of millions of keys at 1% fpp) and is deserialized once
  * per executor via the transient lazy; codegen references the
  * expression instance, so interpreted and generated paths share the
  * same deserialized filter.
  */
case class MightContainBloomExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bloom"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[MightContainBloomExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainBloomExpr =
    copy(child = newChild)

  // value equality over the bytes: the default case-class equality
  // compares Array[Byte] by reference, so two separately-constructed
  // but identical probes would never canonicalize equal — breaking
  // CacheManager lookups and ReuseExchange across identical subplans
  override def equals(other: Any): Boolean = other match {
    case MightContainBloomExpr(c, b) =>
      c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomFunctions {

  /** Serialize a built filter for embedding into a plan. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `might_contain_bloom(key)` over a long column. */
  def mightContainBloom(key: Column, bloomBytes: Array[Byte]): Column =
    GraftColumnBridge.column(
      MightContainBloomExpr(GraftColumnBridge.expression(key), bloomBytes))
}
