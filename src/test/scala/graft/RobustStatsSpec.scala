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
    val ev = (clean :+ (99L, "click", 40.0))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-03-01 10:00:00")))
      .withColumn("user_id", lit(1L))
    ev.write.parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q48_outliers_mad")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"),
        r.getAs[Double]("robust_z")))
    assert(out.length == 1)
    assert(out(0)._1 == 99L && out(0)._2 == 40.0)
    assert(math.abs(out(0)._3 - 40.47) < 1e-9)
  }
}
