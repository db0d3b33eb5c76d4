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
}
