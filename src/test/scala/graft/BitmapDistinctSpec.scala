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
