package graft

import org.apache.spark.sql.functions._
import graft.functions.BitmapDistinctAggregate.bitmapDistinct

/** Contract tests for the exact bitmap distinct-count aggregate. */
class BitmapDistinctSpec extends SparkSpec {

  test("bitmap distinct equals countDistinct on random grouped keys, any partitioning") {
    import spark.implicits._
    val rows = {
      var x = 99L
      (1 to 5000).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ("g" + math.floorMod(x, 6), math.floorMod(x >> 17, 4096))
      }
    }
    val df = rows.toDF("grp", "k")
    val want = df.groupBy("grp").agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exercise the merge path across several partition layouts — the
    // bit-OR must be merge-order-independent
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts).groupBy("grp")
        .agg(bitmapDistinct(col("k"), 4096).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("sparse partials survive the serialize round-trip (few keys, huge domain)") {
    import spark.implicits._
    // 3 distinct keys spread across a 2^24 domain: partial buffers are
    // ~2 MB dense, so the shuffle must be shipping the sparse encoding
    val df = Seq(("a", 5L), ("a", 9999999L), ("a", 16000000L), ("a", 5L))
      .toDF("grp", "k")
    val got = df.repartition(4).groupBy("grp")
      .agg(bitmapDistinct(col("k"), 1 << 24).as("n")).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 3L)))
  }

  test("distinct MV: bitmap values survive parquet; repeated delta folds equal the recompute") {
    import spark.implicits._
    import graft.operators.{HierarchyAgg, HierarchyDimension}
    val nodes = Seq(
      ("root", 1L, "Root", "All", null.asInstanceOf[String]),
      ("a", 11L, "A", "Leaf", "root"),
      ("b", 21L, "B", "Leaf", "root"))
      .toDF("node_id", "node_natural_key", "node_name", "level_name", "parent_node_id")
    val dim = new HierarchyDimension(nodes).aggregationDim
    def facts(rows: (Long, Long)*) = rows.toSeq
      .toDF("leaf_key", "customer_id")
      .withColumn("unit_quantity", lit(1.0))
      .withColumn("sales_amount", lit(1.0))
    // batch 1 → store to parquet (the binary column must survive),
    // fold batch 2 from the LOADED store, fold batch 3 from that
    val dir = java.nio.file.Files.createTempDirectory("dmv").toString
    HierarchyAgg.distinctMv(facts((11L, 1L), (21L, 2L)), dim, 64)
      .write.parquet(s"$dir/mv1")
    val mv2 = HierarchyAgg.mergeDistinctMv(
      spark.read.parquet(s"$dir/mv1"), facts((11L, 2L), (11L, 1L)), dim, 64)
    mv2.write.parquet(s"$dir/mv2")
    val mv3 = HierarchyAgg.mergeDistinctMv(
      spark.read.parquet(s"$dir/mv2"), facts((21L, 3L)), dim, 64)
    val got = HierarchyAgg.readDistinctMv(mv3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = HierarchyAgg.readDistinctMv(HierarchyAgg.distinctMv(
      facts((11L, 1L), (21L, 2L), (11L, 2L), (11L, 1L), (21L, 3L)), dim, 64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // root sees all 3 customers; leaf a sees {1,2}; leaf b sees {2,3}
    assert(want.values.toSeq.sorted == Seq(2L, 2L, 3L))
    // REPLAY idempotence (at-least-once delivery still exact): folding
    // the same delta again changes nothing — set union is idempotent
    val replayed = HierarchyAgg.readDistinctMv(
      HierarchyAgg.mergeDistinctMv(mv3, facts((21L, 3L)), dim, 64))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed == want)
  }

  test("nulls are ignored; out-of-domain keys fail loudly") {
    import spark.implicits._
    val withNulls = Seq(Some(1L), None, Some(2L), Some(1L))
      .toDF("k").withColumn("g", lit("x"))
    val n = withNulls.groupBy("g").agg(bitmapDistinct(col("k"), 64).as("n"))
      .head().getLong(1)
    assert(n == 2L)
    val e = intercept[org.apache.spark.SparkException] {
      Seq(100L).toDF("k").agg(bitmapDistinct(col("k"), 64).as("n")).collect()
    }
    assert(e.getMessage.contains("outside domain")
      || Option(e.getCause).exists(_.getMessage.contains("outside domain")),
      e.getMessage)
  }
}
