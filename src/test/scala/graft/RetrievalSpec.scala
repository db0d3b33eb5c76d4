package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Similarity}

class RetrievalSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)
  lazy val emb = Tables.embeddings(spark, sf)

  test("bm25: hand-computed score on a controlled fixture") {
    import spark.implicits._
    // q (doc 0): "apple banana"; doc 10 shares the rare term pair,
    // doc 11 shares only the common term, doc 12 shares nothing
    val fixture = Seq(
      (0L, "apple banana"),
      (10L, "apple banana cherry"),
      (11L, "banana banana banana"),
      (12L, "durian elderberry fig")
    ).toDF("doc_id", "text")
    val rows = Retrieval.bm25TopK(fixture, k = 3, nQueries = 1)
      .collect().sortBy(_.getAs[Long]("rank"))
    // apple: df=2, banana: df=3, N=4, avgdl=(2+3+3+3)/4=2.75
    def idf(df: Double) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def part(idfV: Double, tf: Double, dl: Double) =
      idfV * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.75))
    val d10 = part(idf(2), 1, 3) + part(idf(3), 1, 3)
    val d11 = part(idf(3), 3, 3)
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L))
    assert(math.abs(rows(0).getAs[Double]("bm25") -
      BigDecimal(d10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(rows(1).getAs[Double]("bm25") -
      BigDecimal(d11).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // doc 12 shares no term — absent, not scored 0: the filter
    // constrains candidate generation (term-keyed join), not ranking
    assert(!rows.exists(_.getAs[Long]("doc_id") == 12L))
  }

  test("bm25 over the documents table: k ranked rows per query, no self-hits, scores descend") {
    val rows = Retrieval.bm25TopK(docs).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("doc_id") != r.getAs[Long]("q_id")))
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("bm25"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hybrid RRF: fused scores equal the hand formula; dual-list docs beat single-list peers") {
    val lex = Retrieval.bm25TopK(docs, k = 20).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) -> r.getAs[Long]("rank")).toMap
    val sem = Similarity.bruteForceTopK(emb, k = 20, nQueries = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Long]("rank")).toMap
    val fused = Retrieval.hybridRrf(docs, emb).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"))
      val expect = lex.get(key).map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
        sem.get(key).map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") -
        BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"rrf mismatch for $key")
    }
    // every fused doc came from at least one retriever's top-20
    fused.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"))
      assert(lex.contains(key) || sem.contains(key), s"fused doc outside both lists: $key")
    }
  }

  test("plans: bm25 candidates come from the term equi-join; rerank is the bounded heap") {
    val p = SparkEntry.queries("t18_bm25_topk")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("topk_by_score"), p.take(2000))
    val ph = SparkEntry.queries("s10_hybrid_rrf")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!ph.contains("CartesianProduct") ||
      // the 1-row stats broadcast is the only sanctioned cross join
      !ph.contains("CartesianProduct\n"), ph.take(2000))
    assert(ph.contains("FullOuter"), ph.take(3000))
  }
}
