package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate.topkByScore
import graft.functions.VectorFunctions._
import graft.operators.Similarity

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap topk: ordering, ties, k truncation") {
    val df = Seq(
      ("g", 1.0, 10L), ("g", 3.0, 11L), ("g", 2.0, 12L),
      ("g", 3.0, 9L), ("g", 0.5, 13L),
      ("h", 7.0, 1L)
    ).toDF("grp", "s", "i")
    val out = df.groupBy("grp").agg(topkByScore(col("s"), col("i"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    // ties at 3.0: smaller id (9) first; k=3 keeps 3.0/9, 3.0/11, 2.0/12
    assert(out("g") == Seq((3.0, 9L), (3.0, 11L), (2.0, 12L)), out("g").toString)
    assert(out("h") == Seq((7.0, 1L)))
  }

  test("topk: NaN ranks best (Spark desc-sort order) and never poisons the heap") {
    // NaN arrives FIRST, while the heap is filling — under raw
    // `>`-comparisons it would sit at the head and reject every later
    // finite candidate; under the Double.compare total order it simply
    // ranks above +Inf, like row_number over orderBy(desc)
    val df = Seq(
      ("g", Double.NaN, 1L), ("g", 0.5, 2L), ("g", 3.0, 3L),
      ("g", 2.0, 4L), ("g", 1.0, 5L)
    ).toDF("grp", "s", "i")
    val out = df.groupBy("grp").agg(topkByScore(col("s"), col("i"), 3).as("top"))
      .collect().map(r => r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).head
    assert(out.map(_._2) == Seq(1L, 3L, 4L), out.toString)
    assert(out.head._1.isNaN)
  }

  test("topk-rows: NaN score outranks finite scores without blocking them") {
    import graft.functions.TopKAggregate.topkRows
    val rows = Seq(
      (1L, "nn", Double.NaN, 0L), (1L, "aa", 2.0, 10L),
      (1L, "bb", 3.0, 20L), (1L, "cc", 1.0, 30L)
    ).toDF("g", "term", "score", "payload")
    val out = rows.groupBy("g")
      .agg(topkRows(col("score"), col("term"),
        struct(col("term"), col("payload")), 2).as("top"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))).head
    assert(out == Seq("nn", "bb"), out.toString)
  }

  test("topk aggregate reproduces the brute-force knn result without a window") {
    val emb = Tables.embeddings(spark, sf)
    val c = Similarity.corpus(emb)
    val q = c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val viaAgg = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 9))
      .groupBy("q_id")
      .agg(topkByScore(col("cos"), col("vec_id"), 5).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaWindow = Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) -> r.getAs[Long]("neighbor_id")).toMap
    assert(viaAgg == viaWindow)
  }

  test("partial aggregation: plan shows partial_topk before the shuffle") {
    val df = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(topkByScore(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("partial_topk_by_score") || p.contains("partial_"), p.take(1500))
  }

  test("topk-rows: string tie-break, k truncation, payload carried intact") {
    import graft.functions.TopKAggregate.topkRows
    // scores force ties: bb/aa tie at 2.0 (aa wins), dd/cc tie at 1.0
    val rows = Seq(
      (1L, "bb", 2.0, 20L), (1L, "aa", 2.0, 10L),
      (1L, "dd", 1.0, 40L), (1L, "cc", 1.0, 30L),
      (2L, "zz", 5.0, 99L)
    ).toDF("g", "term", "score", "payload")
    val out = rows.groupBy("g")
      .agg(topkRows(col("score"), col("term"),
        struct(col("term"), col("payload"), col("score")), 3).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.term"), col("t.payload"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      (1L, 0) -> ("aa", 10L), (1L, 1) -> ("bb", 20L), (1L, 2) -> ("cc", 30L),
      (2L, 0) -> ("zz", 99L)))
  }

  test("topk-rows: merge across many partitions equals single-partition result") {
    import graft.functions.TopKAggregate.topkRows
    val n = 5000
    val df = spark.range(n).select(
      (col("id") % 7).as("g"),
      concat(lit("t"), lpad(col("id").cast("string"), 5, "0")).as("term"),
      (col("id") % 13).cast("double").as("score"))
    def topk(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(topkRows(col("score"), col("term"),
        struct(col("term"), col("score")), 4).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.term"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // 32 partitions exercises serialize/deserialize + merge; 1 does not
    assert(topk(df.repartition(32)) == topk(df.coalesce(1)))
  }
}
