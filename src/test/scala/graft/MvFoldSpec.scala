package graft

import org.apache.spark.sql.functions._
import graft.operators.{MvBitmapDistinct, MvCount, MvFold, MvSum}

/** The q81 retraction matrix, pinned on planted data: sums and counts
  * fold/retract exactly, a fully-retracted group leaves no ghost row,
  * bitmap-distinct refuses retraction loudly, and the full
  * build→fold→retract→read lifecycle equals a one-shot recompute.
  */
class MvFoldSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("grp")
  private val signed = Seq(MvSum("s", col("v")), MvCount("n"))

  private def facts(rows: (String, Long, Long)*) =
    rows.toDF("grp", "v", "member")

  test("build + fold(append) equals a one-shot build on the union") {
    val hist = facts(("a", 10L, 1L), ("a", 5L, 2L), ("b", 7L, 1L))
    val delta = facts(("a", 3L, 3L), ("c", 1L, 9L))
    val folded = MvFold.read(
      MvFold.fold(MvFold.build(hist, keys, signed), delta, keys, signed),
      keys, signed).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = MvFold.read(
      MvFold.build(hist.unionByName(delta), keys, signed),
      keys, signed).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(folded === oneShot)
    assert(folded === Set(("a", 18L, 3L), ("b", 7L, 1L), ("c", 1L, 1L)))
  }

  test("retraction of ORIGINAL rows cancels sums and counts exactly; a fully-retracted group drops") {
    val hist = facts(("a", 10L, 1L), ("a", 5L, 2L), ("b", 7L, 1L))
    val mv = MvFold.build(hist, keys, signed)
    // partial retraction: one of a's two rows leaves
    val partial = MvFold.read(
      MvFold.fold(mv, facts(("a", 5L, 2L)), keys, signed, retract = true),
      keys, signed).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(partial === Set(("a", 10L, 1L), ("b", 7L, 1L)))
    // full retraction: group b vanishes — no ghost row with zeros
    val full = MvFold.read(
      MvFold.fold(mv, facts(("b", 7L, 1L)), keys, signed, retract = true),
      keys, signed).collect().map(_.getString(0)).toSet
    assert(full === Set("a"))
  }

  test("bitmap-distinct folds append-only (old OR delta) and REFUSES retraction") {
    val dist = Seq(MvBitmapDistinct("d", col("member"), 1 << 10))
    val hist = facts(("a", 0L, 1L), ("a", 0L, 2L), ("b", 0L, 5L))
    val delta = facts(("a", 0L, 2L), ("a", 0L, 3L), ("b", 0L, 5L))
    val read = MvFold.read(
      MvFold.fold(MvFold.build(hist, keys, dist), delta, keys, dist),
      keys, dist).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // idempotent union: re-inserted members count once
    assert(read === Map("a" -> 3L, "b" -> 1L))
    val err = intercept[IllegalArgumentException] {
      MvFold.fold(MvFold.build(hist, keys, dist), delta, keys, dist,
        retract = true)
    }
    assert(err.getMessage.contains("cannot retract"))
  }

  test("mixed signed + bitmap measures fold together while appending") {
    val measures = signed :+ MvBitmapDistinct("d", col("member"), 1 << 10)
    val hist = facts(("a", 10L, 1L), ("b", 7L, 2L))
    val delta = facts(("a", 3L, 1L), ("a", 4L, 9L))
    val read = MvFold.read(
      MvFold.fold(MvFold.build(hist, keys, measures), delta, keys, measures),
      keys, measures).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(read === Set(("a", 17L, 3L, 2L), ("b", 7L, 1L, 1L)))
  }

  test("random batch splits with random retraction subsets equal the one-shot recompute") {
    // deterministic LCG (house convention: no Random in specs)
    var x = 7L
    def nxt(m: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.floorMod(x >> 17, m).toInt
    }
    for (trial <- 1 to 4) {
      val rows = (1 to 60).map { _ =>
        ("g" + nxt(5), nxt(100).toLong, nxt(10).toLong)
      }
      // random 3-way split into hist/delta1/delta2; random subset of
      // HIST rows retracted (retraction contract: original rows only)
      val tagged = rows.map(r => (r, nxt(3)))
      val hist = tagged.collect { case (r, 0) => r }
      val d1 = tagged.collect { case (r, 1) => r }
      val d2 = tagged.collect { case (r, 2) => r }
      val retract = hist.filter(_ => nxt(4) == 0)
      val kept = (hist diff retract) ++ d1 ++ d2
      def df(rs: Seq[(String, Long, Long)]) = facts(rs: _*)
      val folded = MvFold.fold(
        MvFold.fold(MvFold.fold(MvFold.build(df(hist), keys, signed),
          df(d1), keys, signed), df(d2), keys, signed),
        df(retract), keys, signed, retract = true)
      def canon(mv: org.apache.spark.sql.DataFrame) =
        MvFold.read(mv, keys, signed).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(canon(folded) === canon(MvFold.build(df(kept), keys, signed)),
        s"trial $trial: folded != one-shot (hist=${hist.size} " +
          s"d1=${d1.size} d2=${d2.size} retract=${retract.size})")
      // bitmap arm (append-only): folding the same splits without the
      // retraction equals the one-shot distinct over everything
      val dist = Seq(MvBitmapDistinct("d", col("member"), 1 << 10))
      def canonD(mv: org.apache.spark.sql.DataFrame) =
        MvFold.read(mv, keys, dist).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
      val foldedD = MvFold.fold(MvFold.fold(MvFold.build(df(hist), keys, dist),
        df(d1), keys, dist), df(d2), keys, dist)
      assert(canonD(foldedD) === canonD(MvFold.build(df(rows), keys, dist)),
        s"trial $trial: bitmap fold != one-shot")
    }
  }

  test("a persisted MV round-trips through parquet and keeps folding (bitmap column included)") {
    // at 100 TB the stored MV is a TABLE, not a session frame: write
    // it out, reload cold, fold the next delta — identical to the
    // continuous in-session fold (the binary bitmap partial survives
    // the parquet round-trip byte-for-byte)
    val ms = signed :+ MvBitmapDistinct("d", col("member"), 1 << 10)
    val hist = facts(("a", 10L, 1L), ("a", 5L, 2L), ("b", 7L, 5L))
    val delta = facts(("a", 3L, 2L), ("c", 1L, 9L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mv").resolve("mv").toString
    MvFold.build(hist, keys, ms).write.mode("overwrite").parquet(dir)
    val reloaded = MvFold.fold(spark.read.parquet(dir), delta, keys, ms)
    val continuous = MvFold.fold(MvFold.build(hist, keys, ms), delta, keys, ms)
    def canon(mv: org.apache.spark.sql.DataFrame) =
      MvFold.read(mv, keys, ms).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(canon(reloaded) === canon(continuous))
    assert(canon(reloaded) === Set(("a", 18L, 3L, 2L), ("b", 7L, 1L, 1L),
      ("c", 1L, 1L, 1L)))
  }

  test("reserved, duplicate and key-colliding measure names are rejected") {
    val hist = facts(("a", 1L, 1L))
    intercept[IllegalArgumentException] {
      MvFold.build(hist, keys, Seq(MvCount("x"), MvSum("x", col("v"))))
    }
    intercept[IllegalArgumentException] {
      MvFold.build(hist, keys, Seq(MvCount("__mv_n")))
    }
    // a measure named like a grouping key would emit duplicate
    // columns and fail ambiguously at the NEXT fold — refuse upfront
    intercept[IllegalArgumentException] {
      MvFold.build(hist, keys, Seq(MvSum("grp", col("v"))))
    }
    // an MV's measure set is fixed at build: folding with a different
    // set is refused with the contract, not unionByName's opaque
    // unresolved-column error
    val narrow = MvFold.build(hist, keys, Seq(MvCount("n")))
    intercept[IllegalArgumentException] {
      MvFold.fold(narrow, hist, keys, Seq(MvCount("n"), MvSum("s", col("v"))))
    }
    // ... and SYMMETRICALLY (ADVICE r18): an MV built with MORE
    // measures than the fold requests names the extra columns instead
    // of dying inside unionByName
    val wide = MvFold.build(hist, keys, Seq(MvCount("n"), MvSum("s", col("v"))))
    val extra = intercept[IllegalArgumentException] {
      MvFold.fold(wide, hist, keys, Seq(MvCount("n")))
    }
    assert(extra.getMessage.contains("unexpected columns") &&
      extra.getMessage.contains("s"))
  }

  test("histogram-quantile MV fails LOUDLY on NULL measure values (ADVICE r18)") {
    val (lo, hi, nb) = (0L, 128L, 128)
    val withNull = Seq(("a", java.lang.Long.valueOf(5L)), ("a", null))
      .toDF("grp", "v")
    // a silent null bucket would sort first in Spark windows but last
    // in DuckDB's, shifting every cumulative rank — the build must
    // throw, not pollute the store
    val e = intercept[Exception] {
      MvFold.buildHist(withNull, Seq("grp"), col("v"), lo, hi, nb).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    assert(causes(e).exists(_.contains("NULL measure value")), e.toString)
    // non-null rows still build fine through the same guard
    val clean = Seq(("a", 5L), ("a", 6L)).toDF("grp", "v")
    assert(MvFold.buildHist(clean, Seq("grp"), col("v"), lo, hi, nb)
      .count() == 2)
  }

  test("histogram-quantile MV: unit buckets read exact quantiles, fold and RETRACT exactly") {
    // values 1..100, bucket width 1 → quantile = exact order statistic
    val (lo, hi, nb) = (0L, 128L, 128)
    val all = (1L to 100L).map(("a", _)).toDF("grp", "v")
    val mv = MvFold.buildHist(all, Seq("grp"), col("v"), lo, hi, nb)
    val q = MvFold.readHistQuantiles(mv, Seq("grp"), Seq(50, 95), lo, hi, nb)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(q == ((50L, 95L)))
    // split folds equal the one-shot build (batch-boundary invariance)
    val (b1, b2) = ((1L to 37L).map(("a", _)).toDF("grp", "v"),
      (38L to 100L).map(("a", _)).toDF("grp", "v"))
    val folded = MvFold.foldHist(
      MvFold.buildHist(b1, Seq("grp"), col("v"), lo, hi, nb),
      b2, Seq("grp"), col("v"), lo, hi, nb)
    assert(folded.collect().toSet == mv.collect().toSet)
    // retract the top half: quantiles walk back to the 1..50 answers
    val top = (51L to 100L).map(("a", _)).toDF("grp", "v")
    val shrunk = MvFold.foldHist(mv, top, Seq("grp"), col("v"), lo, hi, nb,
      retract = true)
    val q2 = MvFold.readHistQuantiles(shrunk, Seq("grp"), Seq(50, 95),
      lo, hi, nb).collect().map(r => (r.getLong(1), r.getLong(2))).head
    // n = 50: p50 rank 25 → 25; p95 rank ceil(47.5) = 48 → 48
    assert(q2 == ((25L, 48L)))
    // full retraction leaves no ghost group
    val gone = MvFold.foldHist(shrunk, (1L to 50L).map(("a", _)).toDF("grp", "v"),
      Seq("grp"), col("v"), lo, hi, nb, retract = true)
    assert(gone.count() == 0)
  }

  test("histogram-quantile MV clamps out-of-domain values to the edge buckets") {
    val (lo, hi, nb) = (0L, 128L, 128)
    val weird = Seq(("a", -5L), ("a", 1000L)).toDF("grp", "v")
    val mv = MvFold.buildHist(weird, Seq("grp"), col("v"), lo, hi, nb)
    val buckets = mv.collect().map(_.getAs[Int]("__mv_bucket")).sorted
    assert(buckets.toSeq == Seq(0, 127))
    // misconfigured domains are refused upfront
    intercept[IllegalArgumentException] {
      MvFold.buildHist(weird, Seq("grp"), col("v"), 0L, 100L, 7)
    }
    intercept[IllegalArgumentException] {
      MvFold.readHistQuantiles(mv, Seq("grp"), Seq(0), lo, hi, nb)
    }
  }

  test("st37 registered entry: stream-folded MV equals a single-shot recompute") {
    // drives the REAL micro-batch stream (maxFilesPerTrigger=1 over a
    // 4-file source) and compares the read-off against a direct
    // one-shot aggregate — the batch-boundary invariance of the fold,
    // proven on the registered entry itself rather than synthetic rows
    val got = SparkEntry.queries("st37_stream_mv_fold")(spark, sf)
      .collect().map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("order_year")) ->
        (r.getAs[Double]("sum_price"), r.getAs[Long]("n_orders"),
          r.getAs[Long]("distinct_cust"))).toMap
    val want = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(round(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0, 2).as("sum_price"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("distinct_cust"))
      .collect().map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Long]("order_year")) ->
        (r.getAs[Double]("sum_price"), r.getAs[Long]("n_orders"),
          r.getAs[Long]("distinct_cust"))).toMap
    assert(got == want)
  }
}
