package graft

import org.apache.spark.sql.functions._
import graft.operators.Olap

/** Planted-data oracles for the statistical OLAP surface (q66–q69):
  * Pearson matrix, Gini, chi-square independence, Benford digits —
  * each against hand-computed closed forms, including the degenerate
  * cases the gate corpus never exercises (zero variance, perfectly
  * independent tables, an all-equal distribution).
  */
class StatsQueriesSpec extends SparkSpec {

  test("pearsonMatrix: exact ±1 on planted linear data, null on zero variance") {
    import spark.implicits._
    // y = 2x (r=+1), z = -x (r=-1), c constant (degenerate)
    val df = Seq.tabulate(50)(i => ("g", i.toLong, 2L * i, -i.toLong, 7L))
      .toDF("grp", "x", "y", "z", "c")
    val r = Olap.pearsonMatrix(df, Seq("grp"), Seq("x", "y", "z", "c"))
      .collect().head
    assert(r.getAs[Long]("n_rows") == 50L)
    assert(r.getAs[Double]("r_x_y") == 1.0)
    assert(r.getAs[Double]("r_x_z") == -1.0)
    assert(r.getAs[Double]("r_y_z") == -1.0)
    assert(r.isNullAt(r.fieldIndex("r_x_c")), "constant column must yield null")
  }

  test("pearsonMatrix matches a direct double-precision Pearson on LCG data") {
    import spark.implicits._
    var s = 99L
    val rows = (1 to 800).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val x = math.floorMod(s >> 16, 1000)
      s = s * 6364136223846793005L + 1442695040888963407L
      val y = math.floorMod(s >> 16, 1000) + x / 2 // mildly correlated
      ("g", x, y)
    }
    val got = Olap.pearsonMatrix(rows.toDF("grp", "x", "y"),
      Seq("grp"), Seq("x", "y")).collect().head.getAs[Double]("r_x_y")
    val n = rows.size.toDouble
    val sx = rows.map(_._2.toDouble).sum
    val sy = rows.map(_._3.toDouble).sum
    val sxx = rows.map(r => r._2.toDouble * r._2).sum
    val syy = rows.map(r => r._3.toDouble * r._3).sum
    val sxy = rows.map(r => r._2.toDouble * r._3).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(got - want) < 1e-6, s"$got vs $want")
  }

  test("giniByGroup: 0 on equal shares, hand value on a planted split") {
    import spark.implicits._
    val df = Seq(
      ("eq", 1L, 500L), ("eq", 2L, 500L), ("eq", 3L, 500L), ("eq", 4L, 500L),
      // [100, 300]: G = (2·(1·100+2·300) − 3·400) / (2·400) = 0.25
      ("sk", 1L, 300L), ("sk", 2L, 100L)
    ).toDF("grp", "id", "cents")
    val out = Olap.giniByGroup(df, "grp", "id", "cents")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_entities"), r.getAs[Double]("total_revenue"),
          r.getAs[Double]("gini"))).toMap
    assert(out("eq") == ((4L, 20.0, 0.0)))
    assert(out("sk") == ((2L, 4.0, 0.25)))
  }

  test("chi2Cells: zero contribution on a perfectly independent table") {
    import spark.implicits._
    // outer product: observed(r,c) = rowWeight(r) · colWeight(c)
    val rw = Map("a" -> 2L, "b" -> 3L)
    val cw = Map("x" -> 5L, "y" -> 7L, "z" -> 11L)
    val cells = (for { (r, i) <- rw.toSeq; (c, j) <- cw.toSeq }
      yield (r, c, i * j)).toDF("r", "c", "obs")
    val out = Olap.chi2Cells(cells, "r", "c", "obs").collect()
    assert(out.length == 6)
    out.foreach { row =>
      assert(row.getAs[Double]("contribution") == 0.0,
        s"independent cell must contribute 0: $row")
      assert(row.getAs[Double]("expected") ==
        row.getAs[Long]("obs").toDouble)
    }
  }

  test("chi2Cells: hand-computed 2x2 contributions") {
    import spark.implicits._
    // obs = [[10, 20], [30, 40]]; N=100; e11 = 30·40/100 = 12
    // contribution11 = (10−12)²/12 = 1/3
    val cells = Seq(("a", "x", 10L), ("a", "y", 20L),
      ("b", "x", 30L), ("b", "y", 40L)).toDF("r", "c", "obs")
    val out = Olap.chi2Cells(cells, "r", "c", "obs")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("expected"), r.getAs[Double]("contribution"))).toMap
    assert(out(("a", "x")) == ((12.0, 0.333333)))
    assert(out(("a", "y")) == ((18.0, 0.222222)))
    assert(out(("b", "x")) == ((28.0, 0.142857)))
    assert(out(("b", "y")) == ((42.0, 0.095238)))
  }

  test("decileLift: hand-computed gains table on 20 planted customers") {
    import spark.implicits._
    // ids 1..20 with cents = 100·id ⇒ total 21000; decile 1 holds the
    // two richest (2000+1900=3900): share 13/70, lift 130/70
    val df = (1L to 20L).map(i => (i, 100L * i)).toDF("id", "cents")
    val out = Olap.decileLift(df, "id", "cents")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[Double]("revenue"), r.getAs[Double]("share"),
          r.getAs[Double]("cum_share"), r.getAs[Double]("lift")))).toMap
    assert(out.size == 10 && out.values.forall(_._1 == 2L))
    assert(out(1) == ((2L, 39.0, 0.185714, 0.185714, 1.857143)))
    assert(out(10) == ((2L, 3.0, 0.014286, 1.0, 0.142857)))
    // cumulative share half-way: (39+35+31+27+23)/210 = 0.738095…
    assert(out(5)._4 == 0.738095)
  }

  test("keySkewProfile: hand-computed skew stats on a planted hot key") {
    import spark.implicits._
    // key 'a': one hot value (6 rows) + 3 singletons → counts
    // [6,1,1,1]: n=4, total=9, max=6, top1 2/3, mean 2.25, skew 8/3,
    // p50 = 1 (quantile_cont of [1,1,1,6] at 0.5), p99 = 5.85
    val df = (Seq.fill(6)(("h", "x")) ++
      Seq(("k1", "x"), ("k2", "x"), ("k3", "x"))).toDF("a", "b")
    val r = Olap.keySkewProfile(df, Seq("a")).collect().head
    assert(r.getAs[String]("join_key") == "a")
    assert(r.getAs[Long]("n_keys") == 4L)
    assert(r.getAs[Long]("total_rows") == 9L)
    assert(r.getAs[Long]("max_per_key") == 6L)
    assert(r.getAs[Double]("top1_share") == 0.666667)
    assert(r.getAs[Double]("p50_per_key") == 1.0)
    assert(math.abs(r.getAs[Double]("p99_per_key") - 5.85) < 1e-9)
    assert(math.abs(r.getAs[Double]("skew_ratio") - 2.666667) < 1e-9)
    // a uniform key: skew ratio exactly 1
    val u = Olap.keySkewProfile(df, Seq("b")).collect().head
    assert(u.getAs[Double]("skew_ratio") == 1.0 &&
      u.getAs[Long]("n_keys") == 1L)
  }

  test("benfordProfile: digit extraction and shares on planted amounts") {
    import spark.implicits._
    // leading digits: 1×4, 9×2, 3×2 over 8 rows
    val df = Seq(123L, 1L, 19999L, 100L, 987L, 9L, 3L, 333L).toDF("cents")
    val out = Olap.benfordProfile(df, "cents")
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("share"))).toMap
    assert(out(1) == ((4L, 0.5)))
    assert(out(9) == ((2L, 0.25)))
    assert(out(3) == ((2L, 0.25)))
    assert(out.keySet == Set(1, 3, 9))
    // benford column is log10(1+1/d)
    val b1 = Olap.benfordProfile(df, "cents")
      .filter(col("digit") === 1).collect().head.getAs[Double]("benford")
    assert(math.abs(b1 - math.log10(2.0)) < 1e-6)
  }

  test("priceVolumeMix: hand-computed waterfall; effects sum to delta") {
    import spark.implicits._
    // brand A: p0 = 200c/u × 10u → p1 = 250c/u × 12u
    //   price effect (0.50)·10 = 5.00, volume 2·2.00 = 4.00, mix 0.50·2 = 1.00
    // brand B: missing period 1 → dropped
    val f = Seq(
      ("A", 1996, 2000L, 10L), ("A", 1997, 3000L, 12L),
      ("B", 1996, 500L, 5L),
      ("A", 1995, 99999L, 7L) // out-of-window period must be ignored
    ).toDF("brand", "yr", "cents", "qty")
    val out = Olap.priceVolumeMix(f, "brand", "yr", "cents", "qty", 1996, 1997)
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("brand") == "A")
    val r = out.head
    assert(r.getAs[Double]("rev_p0") == 20.0 && r.getAs[Double]("rev_p1") == 30.0)
    assert(r.getAs[Double]("delta_rev") == 10.0)
    assert(r.getAs[Double]("price_effect") == 5.0)
    assert(r.getAs[Double]("volume_effect") == 4.0)
    assert(r.getAs[Double]("mix_effect") == 1.0)
    assert(math.abs(r.getAs[Double]("price_effect") +
      r.getAs[Double]("volume_effect") + r.getAs[Double]("mix_effect") -
      r.getAs[Double]("delta_rev")) < 1e-9,
      "waterfall identity: effects must sum to delta_rev")
  }

  test("q74 aging bucket edges: 30/31, 60/61, 90/91 land on both sides") {
    import spark.implicits._
    // replicate the entry's bucket CASE on planted ages
    val df = Seq(0L, 30L, 31L, 60L, 61L, 90L, 91L).toDF("age_days")
      .withColumn("age_bucket",
        when(col("age_days") <= 30L, "0-30")
          .when(col("age_days") <= 60L, "31-60")
          .when(col("age_days") <= 90L, "61-90")
          .otherwise("91+"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(0L) == "0-30" && m(30L) == "0-30")
    assert(m(31L) == "31-60" && m(60L) == "31-60")
    assert(m(61L) == "61-90" && m(90L) == "61-90")
    assert(m(91L) == "91+")
  }
}
