package graft

import org.apache.spark.sql.functions._
import graft.operators.Olap

/** Oracles for the robust-statistics building block and its q48
  * consumer: the histogram-rank median must equal Spark's own exact
  * percentile() on arbitrary data, and the MAD outlier flag must fire
  * exactly on a planted corruption.
  */
class RobustStatsSpec extends SparkSpec {

  test("exactMedianByGroup equals percentile(0.5) on random grouped doubles") {
    import spark.implicits._
    // deterministic LCG; values span negatives, ties, and sub-integer
    // spreads so bucket boundaries and interpolation both exercise
    val rows = {
      var x = 42L
      (1 to 4001).map { i =>
        x = x * 6364136223846793005L + 1442695040888963407L
        val g = "g" + (math.floorMod(x, 7) + 1)
        val v = math.floorMod(x >> 16, 100000).toDouble / 100.0 - 250.0
        (g, v)
      }
    }
    val df = rows.toDF("grp", "v")
    val got = Olap.exactMedianByGroup(df, "grp", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = df.groupBy("grp")
      .agg(expr("percentile(v, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    for ((g, m) <- want)
      assert(math.abs(got(g) - m) < 1e-9, s"group $g: ${got(g)} vs $m")
  }

  test("exactPercentilesByGroup equals percentile(ps) at quintile cuts on random data") {
    import spark.implicits._
    val rows = {
      var x = 7L
      (1 to 3001).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ("g" + (math.floorMod(x, 4) + 1),
          math.floorMod(x >> 13, 40000).toDouble / 50.0)
      }
    }
    val df = rows.toDF("grp", "v")
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    val got = Olap.exactPercentilesByGroup(df, "grp", "v", ps)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = df.groupBy("grp")
      .agg(expr("percentile(v, array(0.2D, 0.4D, 0.6D, 0.8D))").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == want.keySet)
    for ((g, ws) <- want; (w, i) <- ws.zipWithIndex)
      assert(math.abs(got(g)(i) - w) < 1e-9, s"group $g p=${ps(i)}")
  }

  test("q48 flags exactly the planted corruption, with the hand-computed z") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    // 21 clean clicks at 10±1 (median 10, MAD 0.5) + one 40.0 spike:
    // rz(40) = 0.6745*30/0.5 = 40.47; clean max rz = 0.6745/0.5 = 1.349
    val clean = (1 to 21).map { i =>
      (i.toLong, "click", 10.0 + ((i % 5) - 2).toDouble / 2.0)
    }
    // a degenerate group: >50% identical values → MAD 0 → every
    // off-median row would be ±Inf; the mad<>0 guard must drop the
    // whole group, never emit Inf/NaN rows
    val flat = (1 to 9).map(i => (200L + i, "view", 5.0)) :+
      (250L, "view", 500.0)
    val ev = (clean ++ flat :+ (99L, "click", 40.0))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:00:00")))
      .withColumn("user_id", lit(1L))
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q48_outliers_mad")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"),
        r.getAs[Double]("robust_z")))
    assert(out.length == 1, s"MAD=0 'view' group must be skipped: ${out.toSeq}")
    assert(out(0)._1 == 99L && out(0)._2 == 40.0)
    assert(math.abs(out(0)._3 - 40.47) < 1e-9)
  }

  test("olsByGroup recovers a planted exact line and nulls degenerate groups") {
    import spark.implicits._
    // group a: exactly y = 2.5x − 3 (r² must be 1); group b: noisy
    // line with a hand-checkable closed form; group c: one point and
    // group e: all x equal — both degenerate (null fit).
    val a = (0 to 20).map(i => ("a", i.toDouble, 2.5 * i - 3.0))
    val b = Seq(("b", 0.0, 1.0), ("b", 1.0, 2.0), ("b", 2.0, 2.0), ("b", 3.0, 4.0))
    val c = Seq(("c", 5.0, 7.0))
    val e = Seq(("e", 2.0, 1.0), ("e", 2.0, 9.0))
    val df = (a ++ b ++ c ++ e).toDF("g", "x", "y")
    val got = Olap.olsByGroup(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val (na, sa, ia, ra) = got("a")
    assert(na == 21 && math.abs(sa.get - 2.5) < 1e-9 &&
      math.abs(ia.get + 3.0) < 1e-9 && math.abs(ra.get - 1.0) < 1e-9)
    // group b by hand: n=4 sx=6 sy=9 sxy=18 sxx=14 →
    // slope = (72−54)/(56−36) = 0.9, intercept = (9−0.9·6)/4 = 0.9,
    // r2 = 18²/(20·(4·25−81)) = 324/380
    val (nb, sb, ib, rb) = got("b")
    assert(nb == 4 && math.abs(sb.get - 0.9) < 1e-9 &&
      math.abs(ib.get - 0.9) < 1e-9 && math.abs(rb.get - 324.0 / 380.0) < 1e-9)
    assert(got("c")._2.isEmpty && got("c")._3.isEmpty && got("c")._4.isEmpty)
    assert(got("e")._2.isEmpty, "zero x-variance must not fit a slope")
  }

  test("q56 window distinct equals brute-force recount on a gapped calendar") {
    import spark.implicits._
    // days with a HOLE (the 7-day window must be range-, not
    // row-based): activity on days 1,2,3,10,11 — on day 10 the
    // trailing week covers only days 4..10, so day-1..3 customers
    // drop out even though their rows are adjacent in day order.
    val dir = java.nio.file.Files.createTempDirectory("q56").toString
    val rows = Seq(
      (1L, 101L, "1995-01-01"), (2L, 102L, "1995-01-01"),
      (3L, 101L, "1995-01-02"), (4L, 103L, "1995-01-03"),
      (5L, 101L, "1995-01-10"), (6L, 104L, "1995-01-10"),
      (7L, 102L, "1995-01-11"))
    rows.toDF("o_orderkey", "o_custkey", "ds")
      .withColumn("o_orderdate", to_timestamp(col("ds"))).drop("ds")
      .write.parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q56_rolling_distinct")(spark, dir)
      .collect().map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("active_today"), r.getAs[Long]("active_7d"),
          r.getAs[Long]("new_customers"), r.getAs[Long]("cum_customers"))).toMap
    assert(got("1995-01-01") == ((2L, 2L, 2L, 2L)))
    assert(got("1995-01-03") == ((1L, 3L, 1L, 3L)))
    // day 10: window is Jan 4–10 → only the two day-10 customers
    assert(got("1995-01-10") == ((2L, 2L, 1L, 4L)))
    // day 11: window Jan 5–11 → {101,104} ∪ {102}
    assert(got("1995-01-11") == ((1L, 3L, 0L, 4L)))
  }

  test("q82 rolling median equals a driver-side brute recount (odd and even frames)") {
    val rows = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect().map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[Long]("o_orderkey"),
        r.getAs[java.time.LocalDateTime]("o_orderdate"),
        math.floor(r.getAs[Double]("o_totalprice") * 100.0 + 0.5).toLong))
    val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
      val ordered = rs.sortBy(t => (t._3, t._2))(
        Ordering.Tuple2(Ordering.by((d: java.time.LocalDateTime) =>
          d.toString), Ordering.Long))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        val n = frame.length
        val m = (frame((n + 1) / 2 - 1) + frame(n / 2)).toDouble / 200.0
        ordered(i)._2 -> m
      }
    }
    val got = SparkEntry.queries("q82_rolling_quantile")(spark, sf)
      .collect().map(r => r.getAs[Long]("o_orderkey") ->
        r.getAs[Double]("rolling_median")).toMap
    assert(got.size == want.size)
    // raw doubles from one exact-integer division: equality is exact.
    // first rows exercise odd frames (1,3,..), steady state even+odd
    for ((k, m) <- want) assert(got(k) == m, s"orderkey $k: ${got(k)} vs $m")
  }

  test("q83 decomposition: value recombines from the parts; trend equals a hand recount") {
    val out = SparkEntry.queries("q83_seasonal_decompose")(spark, sf)
      .collect().map(r => r.getAs[String]("day") ->
        (r.getAs[Double]("value"), r.getAs[Double]("trend"),
          r.getAs[Double]("seasonal"), r.getAs[Double]("resid"))).toMap
    // additive identity pre-rounding; each of the four parts is
    // rounded to 2 dp independently → recombination drift ≤ 2 cents
    for ((d, (v, t, se, re)) <- out)
      assert(math.abs(v - (t + se + re)) <= 0.021, s"$d: $v vs ${t + se + re}")
    // hand recount of the centered 7-day trend over daily cents
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("c"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("c")).sortBy(_._1)
    daily.indices.foreach { i =>
      val frame = daily.slice(math.max(0, i - 3), math.min(daily.length, i + 4))
      val trend = frame.map(_._2).sum.toDouble / frame.length / 100.0
      val got = out(daily(i)._1)._2
      assert(math.abs(got - trend) <= 0.006, s"${daily(i)._1}: $got vs $trend")
    }
  }
}
