package graft

import org.apache.spark.sql.functions._
import graft.functions.FrequentItemsAggregate.frequentItems

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame, capacity: Int) =
    df.agg(frequentItems(col("item"), capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.count"), col("h.err"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime: capacity ≥ distinct count gives exact counts with zero error") {
    val df = (1 to 1000).map(i => s"k${i % 17}").toDF("item").repartition(8)
    val out = summarize(df, 32)
    assert(out.length == 17)
    assert(out.forall(_._3 == 0L), "exact regime must carry zero error")
    val truth = (0 until 17).map(k => s"k$k" ->
      (1 to 1000).count(_ % 17 == k).toLong).toMap
    out.foreach { case (it, c, _) => assert(c == truth(it), s"$it: $c vs ${truth(it)}") }
    // output is (count desc, item asc) sorted
    val keys = out.map(t => (-t._2, t._1)).toSeq
    assert(keys == keys.sorted)
  }

  test("approximate regime: bounds always hold; the dominant item is always present") {
    // skewed stream over 200 distinct keys, capacity 16: "hot" is 30%
    // of all rows, the rest spread thin — the SpaceSaving guarantee
    // says any item with freq > N/capacity must be in the summary
    val rows = (1 to 3000).map { i =>
      if (i % 10 < 3) "hot" else s"cold${i % 200}"
    }
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df = rows.toDF("item").repartition(8)
    val out = summarize(df, 16)
    assert(out.length == 16)
    val hot = out.find(_._1 == "hot")
    assert(hot.isDefined, "item above N/capacity missing from the summary")
    out.foreach { case (it, c, e) =>
      val t = truth.getOrElse(it, 0L)
      assert(t <= c, s"$it: count $c underestimates true $t")
      assert(c - e <= t, s"$it: lower bound ${c - e} exceeds true $t")
    }
    // the hot item's lower bound alone certifies dominance
    assert(hot.get._2 - hot.get._3 >= 800, hot.toString)
  }

  test("nulls are ignored; empty input yields an empty summary") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    val out = summarize(df, 4)
    assert(out.toSeq == Seq(("a", 2L, 0L), ("b", 1L, 0L)))
    val empty = summarize(Seq.empty[String].toDF("item"), 4)
    assert(empty.isEmpty)
  }

  test("q42 registry entry matches the exact groupBy ranking at the fixture scale") {
    val exact = Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("source").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val hh = SparkEntry.queries("q42_heavy_hitters")(spark, sf)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("cnt")))
    assert(hh.toSeq == exact.toSeq)
  }
}
