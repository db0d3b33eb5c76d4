package graft

import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {

  test("q43 on a gapped fixture: zero-count gap hours appear and LOCF carries across them") {
    import spark.implicits._
    // user 1: events at 10:05 (v=1.0), 10:40 (v=2.0), 13:10 (v=7.5) —
    // hours 11:00 and 12:00 are gaps; user 2: single event
    val ev = Seq(
      (1L, "2024-03-01 10:05:00", 100L, 1.0),
      (1L, "2024-03-01 10:40:00", 101L, 2.0),
      (1L, "2024-03-01 13:10:00", 102L, 7.5),
      (2L, "2024-03-01 09:30:00", 200L, 3.25)
    ).toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dir = java.nio.file.Files.createTempDirectory("resample").toString
    // reuse the registry entry's own logic through a written table so
    // the spec exercises the exact query the driver runs
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q43_resample_locf")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("grid_hour"),
        r.getAs[Long]("n_events"), r.getAs[Double]("locf_value")))
      .sortBy(t => (t._1, t._2))
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq == Seq("2024-03-01 10:00", "2024-03-01 11:00",
      "2024-03-01 12:00", "2024-03-01 13:00"))
    // hour 10 counts both events, last-in-hour value is 2.0 (later ts)
    assert(u1(0)._3 == 2L && u1(0)._4 == 2.0)
    // the two gap hours carry 0 events and the LOCF value 2.0
    assert(u1(1) == ((1L, "2024-03-01 11:00", 0L, 2.0)))
    assert(u1(2) == ((1L, "2024-03-01 12:00", 0L, 2.0)))
    assert(u1(3)._3 == 1L && u1(3)._4 == 7.5)
    // single-event user: one grid point, its own value
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, "2024-03-01 09:00", 1L, 3.25)))
  }

  test("q44 on a journey fixture: first/last touch per conversion; bare conversions are direct") {
    import spark.implicits._
    // user 1: view → click → PURCHASE → error → PURCHASE;
    // user 2: PURCHASE with no preceding touch
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", 1L, "view"),
      (1L, "2024-03-01 10:05:00", 2L, "click"),
      (1L, "2024-03-01 10:10:00", 3L, "purchase"),
      (1L, "2024-03-01 10:15:00", 4L, "error"),
      (1L, "2024-03-01 10:20:00", 5L, "purchase"),
      (2L, "2024-03-01 11:00:00", 6L, "purchase")
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
    val dir = java.nio.file.Files.createTempDirectory("attrib").toString
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q44_attribution")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("conversion_id") ->
        ((r.getAs[Long]("first_touch_id"), r.getAs[String]("first_touch_type"),
          r.getAs[Long]("last_touch_id"), r.getAs[String]("last_touch_type"))))
      .toMap
    assert(out(3L) == ((1L, "view", 2L, "click")))
    // the first conversion is NOT a touch for the second; error is
    assert(out(5L) == ((1L, "view", 4L, "error")))
    assert(out(6L) == ((-1L, "direct", -1L, "direct")))
  }
}
