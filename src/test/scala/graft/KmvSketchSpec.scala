package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvSketch

/** Oracles for the KMV (bottom-k) distinct sketch — h12's
  * deterministic approximate-distinct primitive. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv buffer: sorted, distinct, capped; merge is union bottom-k") {
    val b = new KmvSketch.Buf(4)
    Seq(9L, 3L, 7L, 3L, 1L, 8L).foreach(b.add)
    // distinct bottom-4 of {9,3,7,1,8} = [1,3,7,8]
    assert(b.n == 4 && b.vals.take(4).toSeq == Seq(1L, 3L, 7L, 8L))
    val o = new KmvSketch.Buf(4)
    Seq(2L, 7L, 0L).foreach(o.add)
    b.merge(o)
    // union {1,3,7,8,2,0} → bottom-4 = [0,1,2,3]
    assert(b.vals.take(4).toSeq == Seq(0L, 1L, 2L, 3L))
    // serialization round-trips
    val rt = KmvSketch.readBuf(KmvSketch.writeBuf(b), 4)
    assert(rt.vals.take(rt.n).toSeq == b.vals.take(b.n).toSeq)
  }

  test("kmv end-to-end: exact below k, ~1/sqrt(k) above, partitioning-invariant") {
    val k = 64
    def estimate(n: Int, parts: Int): Long = {
      val df = spark.range(0, n, 1, parts)
        .select(KmvSketch.kmvHash(col("id")).as("h"))
        .agg(KmvSketch.kmvSketch(col("h"), k).as("sk"))
        .select(KmvSketch.kmvEstimate(col("sk"), k).as("est"))
      df.head().getLong(0)
    }
    // below k: exact whatever the parallelism
    assert(estimate(50, 1) == 50L)
    assert(estimate(50, 7) == 50L)
    // above k: within 3/sqrt(64) ≈ 37% of truth, and BIT-IDENTICAL
    // across partitionings (bottom-k of a union is order-free)
    val e1 = estimate(5000, 1)
    val e8 = estimate(5000, 8)
    assert(e1 == e8, s"partitioning must not move the estimate: $e1 vs $e8")
    assert(math.abs(e1 - 5000) <= 5000 * 0.37, s"estimate $e1 for n=5000")
    // two-phase build + union equals the single-phase sketch
    val twoPhase = spark.range(0, 5000, 1, 8)
      .select((col("id") % 16).as("g"), KmvSketch.kmvHash(col("id")).as("h"))
      .groupBy("g").agg(KmvSketch.kmvSketch(col("h"), k).as("sk"))
      .agg(KmvSketch.kmvUnion(col("sk"), k).as("sk"))
      .select(KmvSketch.kmvEstimate(col("sk"), k).as("est"))
      .head().getLong(0)
    assert(twoPhase == e1, s"union-of-sketches must equal the direct sketch: $twoPhase vs $e1")
  }

  test("q63 sketch set ops: below-k regime is exact; estimates track truth") {
    val out = SparkEntry.queries("q63_sketch_setops")(spark, sf).collect()
    assert(out.nonEmpty)
    // ground truth per segment from a direct distinct count
    val oc = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("c_mktsegment", "o_orderkey % 2 = 0 AS even", "c_custkey")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    out.foreach { r =>
      val seg = r.getString(0)
      val a = oc.collect { case (s, true, c) if s == seg => c }.toSet
      val b = oc.collect { case (s, false, c) if s == seg => c }.toSet
      val (ea, eb, eu, ei) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      def ok(est: Long, truth: Int): Unit =
        if (truth < 64) assert(est === truth.toLong, seg)
        else assert(math.abs(est - truth) <= truth * 0.35, s"$seg est=$est truth=$truth")
      ok(ea, a.size); ok(eb, b.size); ok(eu, (a ++ b).size)
      // inclusion-exclusion consistency
      assert(ei === math.max(ea + eb - eu, 0L), seg)
    }
  }
}
