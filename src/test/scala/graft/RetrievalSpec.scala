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

  test("qlm: sparse decomposition equals the dense Dirichlet sum on a controlled fixture") {
    import spark.implicits._
    val mu = 300.0
    val fixture = Seq(
      (0L, "apple banana cherry", "en", "s", 19L),
      (1L, "banana banana date", "en", "s", 18L),
      (10L, "apple banana apple fig", "en", "s", 22L),
      (11L, "banana fig fig date date", "en", "s", 24L),
      (12L, "grape kiwi lemon", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Retrieval.qlmTopK(fixture, k = 5, nQueries = 2, mu = mu)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("rank"), r.getAs[Double]("qlm"))).toMap
    // dense reference: score(q,d) = Σ_{w ∈ q} ln((tf + μ·cf/|C|)/(dl + μ))
    // over candidate docs (≥1 shared term, d ≠ q). The sparse form
    // drops the query-constant Σ_{w∈q} ln(p(w|C)) — rank-invariant —
    // so the identity is sparse = dense − that constant
    val toks = Map(0L -> Seq("apple", "banana", "cherry"),
      1L -> Seq("banana", "banana", "date"),
      10L -> Seq("apple", "banana", "apple", "fig"),
      11L -> Seq("banana", "fig", "fig", "date", "date"),
      12L -> Seq("grape", "kiwi", "lemon"))
    val cf = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val total = toks.values.map(_.size).sum.toDouble
    val want = for {
      q <- Seq(0L, 1L); d <- toks.keys.toSeq
      if d != q && toks(q).toSet.intersect(toks(d).toSet).nonEmpty
    } yield {
      val dl = toks(d).size.toDouble
      val dense = toks(q).distinct.map { w =>
        val tf = toks(d).count(_ == w).toDouble
        math.log((tf + mu * cf(w) / total) / (dl + mu))
      }.sum
      val qConst = toks(q).distinct.map(w => math.log(cf(w) / total)).sum
      (q, d) -> (dense - qConst)
    }
    assert(got.keySet == want.map(_._1).toSet)
    for (((q, d), s) <- want)
      assert(math.abs(got((q, d))._2 - s) < 1e-6,
        s"($q,$d): ${got((q, d))._2} vs $s")
    // ranks follow the dense scores (desc, doc_id tie-break)
    for (q <- Seq(0L, 1L)) {
      val expOrder = want.filter(_._1._1 == q)
        .sortBy { case ((_, d), s) => (-math.rint(s * 1e9), d) }.map(_._1._2)
      val gotOrder = got.filter(_._1._1 == q).toSeq
        .sortBy(_._2._1).map(_._1._2)
      assert(gotOrder == expOrder, s"q=$q: $gotOrder vs $expOrder")
    }
  }
}
