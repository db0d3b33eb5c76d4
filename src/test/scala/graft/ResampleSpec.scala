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

  test("q75 on a linear fixture: slope is exactly the daily increment") {
    import spark.implicits._
    // one priority, 10 days, revenue 100(d+1) dollars on day d →
    // slope 100 $/day for every window with n >= 2; day 0 is null
    val rows = (0 until 10).map { d =>
      (1000L + d, 1L, "O", 100.0 * (d + 1),
        f"1995-01-${d + 1}%02d 00:00:00", "1-URGENT")
    }
    val dir = java.nio.file.Files.createTempDirectory("rolling").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ts_s", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q75_rolling_ols")(spark, dir)
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n_days"), Option(r.get(3)).map(_ => r.getDouble(3)))))
      .toMap
    assert(out("1995-01-01") == ((1L, None)), "n=1 is under-determined")
    assert(out("1995-01-02") == ((2L, Some(100.0))))
    assert(out("1995-01-10") == ((7L, Some(100.0))), "frame caps at 7 days")
  }

  test("q76 sessions split strictly after 30 minutes") {
    import spark.implicits._
    // user 1: events at 0s, 1800s (stays), 3601s (splits — gap 1801)
    val ev = Seq(
      (1L, "2024-03-01 10:00:00", 1L, "view", 1.5),
      (2L, "2024-03-01 10:30:00", 1L, "view", 2.25),
      (3L, "2024-03-01 11:00:01", 1L, "view", 4.0),
      (4L, "2024-03-01 09:00:00", 2L, "view", 7.0)
    ).toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dir = java.nio.file.Files.createTempDirectory("sessions").toString
    ev.select("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q76_sessions")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_id")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("duration_sec"),
          r.getAs[Double]("total_value")))).toMap
    assert(out((1L, 1L)) == ((2L, 1800L, 3.75)),
      "a gap of exactly 1800 s stays in-session")
    assert(out((1L, 2L)) == ((1L, 0L, 4.0)), "1801 s splits")
    assert(out((2L, 1L)) == ((1L, 0L, 7.0)))
    assert(out.size == 3)
  }

  test("q77 gaps: lag-based day gaps, first order contributes none") {
    import spark.implicits._
    // cust 1 (seg X): orders on days 1, 4, 10 → gaps 3, 6
    // cust 2 (seg X): one order → no gap
    val orders = Seq(
      (1L, 1L, "1995-01-01"), (2L, 1L, "1995-01-04"),
      (3L, 1L, "1995-01-10"), (4L, 2L, "1995-02-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .withColumn("o_totalprice", lit(10.0))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val cust = Seq((1L, "X"), (2L, "X"))
      .toDF("c_custkey", "c_mktsegment")
      .withColumn("c_nationkey", lit(0L)).withColumn("c_name", lit("c"))
    val dir = java.nio.file.Files.createTempDirectory("gaps").toString
    orders.write.parquet(s"$dir/orders.parquet")
    cust.write.parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q77_order_gaps")(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_gaps") == 2L)
    assert(r.head.getAs[Double]("p50_gap_days") == 4.5,
      "interpolated median of {3, 6}")
    assert(r.head.getAs[Double]("p90_gap_days") == 5.7,
      "0.9 quantile interpolates 3 + 0.9*(6-3)")
  }

  test("q78 on a reversal fixture: decile i migrates to decile 11-i") {
    import spark.implicits._
    // 10 customers; 1996 revenue rank = custkey asc (cust 1 richest),
    // 1997 reversed → from_decile i maps 1:1 to to_decile 11-i
    val rows = (1L to 10L).flatMap { c =>
      Seq((c * 10, c, (11 - c) * 100.0, "1996-06-01"),
        (c * 10 + 1, c, c * 100.0, "1997-06-01"))
    }
    val dir = java.nio.file.Files.createTempDirectory("decile").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q78_decile_transition")(spark, dir)
      .collect().map(r => (r.getAs[Long]("from_decile"),
        r.getAs[Long]("to_decile")) ->
        ((r.getAs[Long]("n_customers"), r.getAs[Double]("row_share"))))
      .toMap
    assert(out.size === 10)
    (1L to 10L).foreach { i =>
      assert(out((i, 11 - i)) == ((1L, 1.0)), s"decile $i")
    }
  }

  test("q79 on a two-day fixture: indexes 1.5 / 0.5 around the mean") {
    import spark.implicits._
    // Mon 2026-08-10 revenue 300, Tue 2026-08-11 revenue 100 →
    // overall daily avg 200 → Monday 1.5, Tuesday 0.5
    val rows = Seq(
      (1L, 1L, 300.0, "2026-08-10"), (2L, 1L, 100.0, "2026-08-11"))
    val dir = java.nio.file.Files.createTempDirectory("dowprof").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q79_weekday_profile")(spark, dir)
      .collect().map(r => r.getAs[Long]("dow") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("revenue"),
          r.getAs[Double]("seasonality_index")))).toMap
    assert(out(2L) == ((1L, 300.0, 1.5)), "Monday is Spark dow 2")
    assert(out(3L) == ((1L, 100.0, 0.5)))
  }

  test("q80 LTV: cumulative revenue per cohort customer, hand-computed") {
    import spark.implicits._
    // cohort 1995-01: cust 1 (orders Jan 10, Mar 30) + cust 2 (Jan 20)
    // → offsets 0 (30 rev, 2 active) and 2 (30 rev, 1 active),
    //   cum 30 → 60, ltv 15 → 30 per the 2-customer cohort
    // cohort 1995-02: cust 3 (Feb 5) → offset 0 only
    val rows = Seq(
      (1L, 1L, 10.0, "1995-01-10"), (2L, 2L, 20.0, "1995-01-20"),
      (3L, 1L, 30.0, "1995-03-15"), (4L, 3L, 40.0, "1995-02-05"))
    val dir = java.nio.file.Files.createTempDirectory("ltv").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q80_cohort_ltv")(spark, dir)
      .collect().map(r => (r.getAs[String]("cohort"),
        r.getAs[Long]("month_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue"),
          r.getAs[Double]("ltv_per_customer")))).toMap
    // 1995 ym = 1995*12+1 = 23941 → cohort label "1995-01"
    assert(out(("1995-01", 0L)) == ((2L, 2L, 30.0, 30.0, 15.0)))
    assert(out(("1995-01", 2L)) == ((1L, 2L, 30.0, 60.0, 30.0)))
    assert(out(("1995-02", 0L)) == ((1L, 1L, 40.0, 40.0, 40.0)))
    assert(out.size === 3)
  }
}
