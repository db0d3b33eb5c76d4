package graft

import org.apache.spark.sql.functions._

/** Fixture oracles for the round-13 session additions: q46 market
  * basket, q47 path analysis, d18 dictionary-grain fuzzy names, q49
  * window funnel. Each test writes a hand-computable star-schema
  * slice and drives the registry entry itself, so the spec exercises
  * exactly the query the driver runs.
  */
class BasketPathFuzzySpec extends SparkSpec {

  test("q46 on a four-order fixture: pair counts, support and lift match hand math") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("basket").toString
    Seq((1L, "A"), (2L, "B"), (3L, "B"), (4L, "C"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(s"$dir/part.parquet")
    // baskets: o1={A,B} o2={A,B} o3={A,C} o4={B}; p1/p3 in o2 both map
    // to distinct brands, and o4's single-brand basket emits no pair
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_shipdate", to_timestamp(lit("1997-01-01 00:00:00")))
      .write.parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q46_market_basket")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("brand_a"), r.getAs[String]("brand_b")) ->
        ((r.getAs[Long]("pair_cnt"), r.getAs[Double]("support"),
          r.getAs[Double]("lift"))))
      .toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C")))
    // n_orders=4, cnt(A)=3, cnt(B)=3, cnt(C)=1; lift rounds to 6 dp
    assert(out(("A", "B")) == ((2L, 0.5, 0.888889)))
    assert(out(("A", "C")) == ((1L, 0.25, 1.333333)))
  }

  test("q47 on a journey fixture: first-3 paths, short journeys kept, deterministic rank") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("paths").toString
    Seq(
      (1L, "2024-03-01 10:00:00", 1L, "view"),
      (1L, "2024-03-01 10:01:00", 2L, "click"),
      (1L, "2024-03-01 10:02:00", 3L, "purchase"),
      (1L, "2024-03-01 10:03:00", 4L, "error"), // 4th event never in path
      (2L, "2024-03-01 11:00:00", 5L, "view"),
      (2L, "2024-03-01 11:01:00", 6L, "click"),
      (2L, "2024-03-01 11:02:00", 7L, "purchase"),
      (3L, "2024-03-01 12:01:00", 9L, "view"), // ts order, not id order
      (3L, "2024-03-01 12:00:00", 8L, "click")
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q47_path_topk")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("path"),
        r.getAs[Long]("n_users")))
      .sortBy(_._1)
      .toSeq
    assert(out == Seq(
      (1L, "view>click>purchase", 2L),
      (2L, "click>view", 1L)))
  }

  test("q49 on a journey fixture: the 6h window gates the chain; later views restart it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wfunnel").toString
    Seq(
      // user 1: view→click inside the window, purchase 7h after the
      // only view — level 2, not 3
      (1L, "2024-03-01 00:00:00", 1L, "view"),
      (1L, "2024-03-01 00:10:00", 2L, "click"),
      (1L, "2024-03-01 07:00:00", 3L, "purchase"),
      // user 2: the first view→click pair is stale, but a LATER view
      // restarts the chain (view 05:00 → click 05:10 → purchase
      // 06:30 fits in 6h) — level 3. A greedy anchor at the first
      // view would miss this; the cascaded running max must not.
      (2L, "2024-03-01 00:00:00", 4L, "view"),
      (2L, "2024-03-01 00:10:00", 5L, "click"),
      (2L, "2024-03-01 05:00:00", 6L, "view"),
      (2L, "2024-03-01 05:10:00", 7L, "click"),
      (2L, "2024-03-01 06:30:00", 8L, "purchase"),
      // user 3: click BEFORE any view never starts a chain — level 1
      (3L, "2024-03-01 00:00:00", 9L, "click"),
      (3L, "2024-03-01 01:00:00", 10L, "view"),
      // user 4: purchase with no prefix at all — level 0
      (4L, "2024-03-01 00:00:00", 11L, "purchase")
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q49_window_funnel")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("funnel_level"))
      .toMap
    assert(out == Map(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 0L))
  }

  test("q52 on a sequence fixture: adjacency required, multi-match counted, noise rejected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("patmatch").toString
    def ev(u: Long, i: Int, ty: String) =
      (u, f"2024-03-01 10:${i}%02d:00", u * 100 + i, ty)
    (Seq(
      // user 1: v c c p — one match spanning both clicks (greedy c+)
      ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "click"), ev(1, 3, "purchase"),
      // user 2: v e c p — the error BREAKS adjacency: pattern
      // matching rejects what q49's windowed funnel would accept
      ev(2, 0, "view"), ev(2, 1, "error"), ev(2, 2, "click"), ev(2, 3, "purchase"),
      // user 3: two complete chains in one day → two matches
      ev(3, 0, "view"), ev(3, 1, "click"), ev(3, 2, "purchase"),
      ev(3, 3, "view"), ev(3, 4, "click"), ev(3, 5, "purchase")))
      .toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q52_pattern_match")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("seq"), r.getAs[Long]("n_matches"),
          r.getAs[String]("first_match")))).toMap
    assert(out == Map(
      1L -> (("vccp", 1L, "vccp")),
      3L -> (("vcpvcp", 2L, "vcp"))))
  }

  test("q53 on a planted level shift: clamp holds pre-shift, alarm fires post-shift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    // 10 quiet days at 10 events, then 5 shifted days at 30 events
    val rows = for {
      day <- 1 to 15
      n = if (day <= 10) 10 else 30
      i <- 1 to n
    } yield (1000L * day + i, f"2024-03-$day%02d 10:00:${i % 60}%02d",
      (day * 100 + i).toLong, "view")
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q53_cusum")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Double]("cusum"), r.getAs[Boolean]("alarm"))))
      .toMap
    // mu = (10*10 + 5*30)/15 = 16.667; pre-shift slack is negative so
    // the clamp pins cusum to 0 and nothing alarms
    (1 to 10).foreach { d =>
      val (c, a) = out(f"2024-03-$d%02d")
      assert(c == 0.0 && !a, s"day $d: $c $a")
    }
    // post-shift the statistic ramps by 30 − 1.1·mu ≈ 11.67/day and
    // crosses the 0.5·mu ≈ 8.33 alarm line on the FIRST shifted day
    (11 to 15).foreach { d =>
      val (c, a) = out(f"2024-03-$d%02d")
      assert(c > 8.33 && a, s"day $d: $c $a")
    }
    // monotone ramp while the shift persists
    assert(out("2024-03-15")._1 > out("2024-03-11")._1)
  }

  test("q61 on a planted linear ramp: level/trend/forecast match hand-folded Holt exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("holt").toString
    // daily counts 10, 12, 14, 16 — a clean +2/day ramp
    val counts = Seq(10, 12, 14, 16)
    val rows = for {
      (n, di) <- counts.zipWithIndex
      i <- 1 to n
    } yield (1000L * (di + 1) + i, f"2024-04-${di + 1}%02d 09:00:${i % 60}%02d",
      i.toLong, "click")
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q61_holt_forecast")(spark, dir)
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast"), r.getAs[Double]("forecast_err")))).toMap
    // hand fold (α=.5, β=.25): l₁=10, tr seeds from level change
    // day2: lv=11, tr=1, fc=10, err=2
    // day3: lv=.5·14+.5·12=13, tr=.25·2+.75·1=1.25, fc=12, err=2
    // day4: lv=.5·16+.5·14.25=15.125, tr=.25·2.125+.75·1.25=1.46875,
    //       fc=14.25, err=1.75
    assert(out("2024-04-02") == ((11.0, 1.0, 10.0, 2.0)))
    assert(out("2024-04-03") == ((13.0, 1.25, 12.0, 2.0)))
    assert(out("2024-04-04") == ((15.125, 1.46875, 14.25, 1.75)))
    assert(!out.contains("2024-04-01"), "day 1 has no forecast")
  }

  test("d18 on a name fixture: shared-token candidates within distance; row counts attach") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    Seq(
      (1L, "acme corp"),  // twice: n_parts must aggregate
      (2L, "acme corp"),
      (3L, "acme corpp"), // dist 1 to "acme corp", shares "acme"
      (4L, "beta labs"),
      (5L, "zeta labs"),  // dist 1 to "beta labs", shares "labs"
      (6L, "gamma inc"),
      (7L, "delta inc"),  // shares "inc" but dist("gamma","delta")=4 → cut
      (8L, "widget"),
      (9L, "widgit")      // single-token, NO shared token — trigram channel
    ).toDF("p_partkey", "p_name")
      .withColumn("p_brand", lit("X"))
      .write.parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("d18_fuzzy_names")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Long]("dist"), r.getAs[Long]("n_parts_a"),
        r.getAs[Long]("n_parts_b")))
      .sortBy(_._1)
      .toSeq
    assert(out == Seq(
      ("acme corp", "acme corpp", 1L, 2L, 1L),
      ("beta labs", "zeta labs", 1L, 1L, 1L),
      ("widget", "widgit", 1L, 1L, 1L)))
  }
}
