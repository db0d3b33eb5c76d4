package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Nearest-centroid ARGMAX over a broadcast codebook — one output row
  * per input vector.
  *
  * The previous assignment plan (`crossJoin(broadcast(centroids))` +
  * `max_by` hash aggregate) was partial-aggregated but still
  * materialized n×k intermediate rows into the aggregate and paid a
  * full-corpus shuffle on `vec_id`; at 100 TB × k = 65,536 that is
  * ~65k× row amplification feeding an exchange. This expression is
  * the (b) tier of the custom-operator ladder: the codebook (bounded
  * at 65,536 × dim doubles by [[graft.operators.Similarity.autoK]])
  * rides in the expression itself — serialized once into the task
  * binary, which the scheduler broadcasts per stage — and the argmax
  * is a tight primitive loop inside whole-stage codegen. No join, no
  * shuffle, one row in → one row out.
  *
  * Semantics are IDENTICAL to the old plan, including the tie-break:
  * maximize (round(cos, 9) DESC, c_id ASC), with the cosine computed
  * as dot(v, cv) / (nrm × cn) in left-to-right summation order and
  * rounded exactly like Spark's `round` (HALF_UP over
  * BigDecimal.valueOf). Returns null for a null vector/norm or an
  * empty codebook.
  */
case class NearestCentroidExpr(left: Expression, right: Expression,
    centroidIds: Array[Long], centroidVecs: Array[Array[Double]],
    centroidNorms: Array[Double])
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroidExpr.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Double], centroidIds, centroidVecs, centroidNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the parsed codebook is registered ONCE as a codegen reference —
    // per-row code is a single static call over primitive arrays
    val ids = ctx.addReferenceObj("centroidIds", centroidIds, "long[]")
    val vecs = ctx.addReferenceObj("centroidVecs", centroidVecs, "double[][]")
    val norms = ctx.addReferenceObj("centroidNorms", centroidNorms, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.NearestCentroidExpr.compute($a, $b, $ids, $vecs, $norms);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidExpr =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidExpr {

  /** Round exactly as Spark's `round(x, 9)` does for doubles:
    * BigDecimal.valueOf (i.e. Double.toString) + HALF_UP; NaN/±Inf
    * pass through untouched.
    */
  def round9(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData, nrm: Double, ids: Array[Long],
      vecs: Array[Array[Double]], norms: Array[Double]): Long = {
    if (ids.length == 0) return Long.MinValue
    var bestId = 0L
    var bestCos = 0.0
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      val n = math.min(v.numElements(), cv.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * cv(i); i += 1 }
      val cos = round9(s / (nrm * norms(c)))
      // maximize (cos DESC, c_id ASC) under SPARK's double ordering —
      // Double.compare ranks NaN above every value and NaN == NaN, the
      // same total order the old max_by(c_id, struct(round(ccos, 9),
      // -c_id)) aggregate used. A zero-norm vector (the embed kernels
      // emit one for token-free text) makes every cosine 0/0 = NaN, and
      // this order assigns it the smallest c_id — the old plan's
      // behavior — instead of leaking a phantom Long.MinValue cluster.
      // Seeding from c = 0 (not a -Infinity sentinel) keeps a genuine
      // -Infinity cosine at the first centroid selectable.
      val cmp = if (c == 0) 1 else java.lang.Double.compare(cos, bestCos)
      if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
        bestCos = cos
        bestId = ids(c)
      }
      c += 1
    }
    bestId
  }

  /** Column facade: `nearestCentroid(v, nrm, codebook)` with the
    * codebook as driver-side arrays (collect it from the bounded
    * centroid frame; sorted by c_id for deterministic iteration).
    */
  def nearestCentroid(v: Column, nrm: Column, ids: Array[Long],
      vecs: Array[Array[Double]], norms: Array[Double]): Column = {
    require(ids.length > 0, "empty codebook")
    require(ids.length == vecs.length && ids.length == norms.length)
    GraftColumnBridge.column(NearestCentroidExpr(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(nrm),
      ids, vecs, norms))
  }
}
