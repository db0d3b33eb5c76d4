package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf)
  lazy val brute = Similarity.bruteForceTopK(emb).collect()
    .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("brute force: 5 ranked neighbors per query, no self-matches, cosine descending") {
    val rows = Similarity.bruteForceTopK(emb).collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id")))
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mmrDiversify: redundancy penalty flips the pick order on a planted near-dup") {
    import spark.implicits._
    // query 0 = (1,0,0); ids 1 and 2 are near-dups of each other
    // (cos ≈ 0.995, relevance ≈ 0.800 / 0.804 after normalization);
    // id 3 is slightly less relevant (0.789) but diverse. Pure
    // relevance ranks 2,1,3 — MMR must pick 2, then DEMOTE the
    // near-dup 1 below the diverse 3.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0.8f, 0.6f, 0f), 0),
      (2L, Array(0.8f, 0.59f, 0.05f), 0),
      (3L, Array(0.78f, -0.6f, 0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.mmrDiversify(vecs, k = 3, shortlist = 3,
      nQueries = 1)
      .collect().sortBy(_.getAs[Long]("pick_rank"))
      .map(r => (r.getAs[Long]("pick_rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("relevance"), r.getAs[Double]("mmr_score")))
    assert(got.map(_._2).toSeq == Seq(2L, 3L, 1L),
      s"expected diversity-flipped order, got ${got.toSeq}")
    // pure-relevance order would have been 2,1,3
    assert(got(2)._3 > got(1)._3,
      "the demoted near-dup must be MORE relevant than the diverse pick")
    // pick 1 is pure relevance: score = 0.7·rel
    assert(math.abs(got(0)._4 - 0.7 * got(0)._3) < 1e-5)
    // the near-dup's penalized score collapses well below the diverse
    // pick's (sim to pick 1 ≈ 0.995 ⇒ score ≈ 0.7·0.800 − 0.3·0.995)
    assert(got(1)._4 - got(2)._4 > 0.15,
      s"penalty too weak: ${got(1)._4} vs ${got(2)._4}")
  }

  test("nearest-centroid expression: assignments identical to the crossJoin+max_by plan") {
    import graft.operators.Similarity.corpus
    val c = corpus(emb)
    val centroids = Similarity.kmeansCentroids(c, k = 10, iters = 2)
    // the OLD assignment plan, verbatim: n×k crossJoin into a max_by
    // hash aggregate with the (round(cos,9) desc, c_id asc) tie-break
    val oldPlan = c.crossJoin(broadcast(centroids))
      .withColumn("ccos",
        graft.functions.VectorFunctions.dot(col("v"), col("cv")) /
          (col("nrm") * col("cn")))
      .groupBy("vec_id")
      .agg(max_by(col("c_id"), struct(round(col("ccos"), 9), -col("c_id"))).as("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the NEW plan: codegen'd argmax over the collected codebook
    val cb = centroids.select(col("c_id"), col("cv"), col("cn"))
      .collect().sortBy(_.getLong(0))
    val newPlan = c.withColumn("c_id",
        graft.functions.NearestCentroidExpr.nearestCentroid(
          col("v"), col("nrm"), cb.map(_.getLong(0)),
          cb.map(_.getSeq[Double](1).toArray), cb.map(_.getDouble(2))))
      .select("vec_id", "c_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(newPlan.size == oldPlan.size)
    val diff = oldPlan.collect { case (id, cid) if newPlan(id) != cid =>
      (id, cid, newPlan(id)) }
    assert(diff.isEmpty, s"assignment divergence: ${diff.take(5)}")
    // and the operator plan is exchange/join-free: a narrow map
    val assignedPlan = Similarity.semanticDedup(emb, k = 5)
      .queryExecution.executedPlan.toString
    assert(!assignedPlan.contains("CartesianProduct"))
  }

  test("nearest-centroid expression: zero-norm vector matches the old plan (NaN ordering)") {
    import spark.implicits._
    // the embed kernels emit an all-zero vector for token-free text:
    // nrm = 0 makes every cosine 0/0 = NaN. The old max_by plan ranked
    // NaN as the largest double and tie-broke to the SMALLEST c_id —
    // the expression must do the same, not leak a Long.MinValue id.
    val dim = 4
    val vecs = Seq(
      (1L, Array.fill(dim)(0.0), 0.0),             // zero vector
      (2L, Array(1.0, 0.0, 0.0, 0.0), 1.0))        // sanity: a real one
      .toDF("vec_id", "v", "nrm")
    val cb = Seq(
      (7L, Array(0.0, 1.0, 0.0, 0.0), 1.0),
      (3L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
      (9L, Array(0.0, 0.0, 1.0, 0.0), 1.0)).sortBy(_._1)
    // cosine as dot × (nrm·cn)^-1 instead of a / division: ANSI mode
    // (Spark 4 default) throws on 0/0, while 0 × Infinity = NaN — the
    // non-ANSI NaN the old plan's ordering contract is defined over
    val oldPlan = vecs.crossJoin(broadcast(
        cb.toDF("c_id", "cv", "cn")))
      .withColumn("ccos",
        graft.functions.VectorFunctions.dot(col("v"), col("cv")) *
          pow(col("nrm") * col("cn"), -1.0))
      .groupBy("vec_id")
      .agg(max_by(col("c_id"), struct(round(col("ccos"), 9), -col("c_id"))).as("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newPlan = vecs.withColumn("c_id",
        graft.functions.NearestCentroidExpr.nearestCentroid(
          col("v"), col("nrm"), cb.map(_._1).toArray,
          cb.map(_._2).toArray, cb.map(_._3).toArray))
      .select("vec_id", "c_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oldPlan == newPlan, s"old $oldPlan vs new $newPlan")
    assert(newPlan(1L) == 3L) // NaN everywhere -> smallest c_id
    assert(newPlan(2L) == 3L) // genuine best match
  }

  test("vector_mean aggregate equals the fixed-point posexplode reference plan") {
    import graft.functions.VectorMeanAgg.vectorMean
    import graft.operators.Similarity.corpus
    val c = corpus(emb)
    val centroids = Similarity.kmeansCentroids(c, k = 10, iters = 1)
    val assigned = c.withColumn("c_id", lit(0L)) // one group: the global mean
    val got = assigned.groupBy("c_id").agg(vectorMean(col("v")).as("cv"))
      .head().getSeq[Double](1)
    // reference: micro-quantized integer sums / count / 1e6 — the
    // aggregate's committed fixed-point contract, BIT-exact (no
    // tolerance): partitioning cannot move an integer sum
    val ref = assigned
      .select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("c_id", "pos")
      .agg((sum(floor(col("x") * 1e6 + 0.5).cast("long")).cast("double")
        / count(lit(1)) / 1e6).as("cx"))
      .orderBy("pos").collect().map(_.getDouble(2))
    assert(got.length == ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g == r, s"$g vs $r") }
    // and the true float mean stays within the 5e-7 quantization bound
    val fl = assigned.select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("c_id", "pos").agg(avg("x").as("cx"))
      .orderBy("pos").collect().map(_.getDouble(2))
    got.zip(fl).foreach { case (g, r) =>
      assert(math.abs(g - r) < 5e-7, s"$g vs $r") }
    // and the full kmeans pipeline stays deterministic run-to-run
    val again = Similarity.kmeansCentroids(c, k = 10, iters = 1)
    val a = centroids.orderBy("c_id").collect().map(_.getSeq[Double](1))
    val b = again.orderBy("c_id").collect().map(_.getSeq[Double](1))
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("range search: exactly the pairs at/above the threshold, consistent with brute force") {
    val tau = 0.3
    val ranged = Similarity.rangeSearch(emb, tau = tau).collect()
    assert(ranged.forall(r => r.getAs[Double]("cosine") >= tau - 1e-6))
    assert(ranged.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id")))
    // every brute-force top-k hit at/above tau must be in the range result
    val rangedSet = ranged
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    Similarity.bruteForceTopK(emb).collect()
      .filter(_.getAs[Double]("cosine") >= tau)
      .foreach { r =>
        assert(rangedSet.contains(
          (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
      }
  }

  test("MIPS: magnitude outranks direction; planted vectors hand-checked") {
    import spark.implicits._
    // q (id 0) points along e1. Corpus: id 1 is PERFECTLY aligned but
    // short (ip 1, cos 1); id 2 is misaligned but long (ip 4 > 1,
    // cos ~0.89); id 3 near-orthogonal (ip 0.2). MIPS must rank
    // 2 > 1 > 3 while cosine ranks 1 > 2 > 3.
    val vecs = Seq(
      (0L, "q", Array(1.0f, 0.0f)),
      (1L, "short_aligned", Array(1.0f, 0.0f)),
      (2L, "long_tilted", Array(4.0f, 2.0f)),
      (3L, "orthogonalish", Array(0.2f, 4.0f))
    ).toDF("vec_id", "label", "embedding")
    val mips = Similarity.mipsTopK(vecs, k = 3, nQueries = 1).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(mips.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 1L, 3L))
    assert(mips.map(_.getAs[Double]("inner_product")).toSeq == Seq(4.0, 1.0, 0.2))
    val cosRank = Similarity.bruteForceTopK(vecs, k = 3, nQueries = 1).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    assert(cosRank == Seq(1L, 2L, 3L))
    // on the real table: structurally valid, scores descending per query
    val rows = Similarity.mipsTopK(emb).collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id")))
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("inner_product"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("MIPS ANN: asymmetric-LSH recall vs exact MIPS; scores are exact inner products") {
    val exact = Similarity.mipsTopK(emb).collect()
    val exactSet = exact
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exactIp = exact.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("inner_product")).toMap
    val rows = Similarity.mipsLshTopK(emb).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("inner_product"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id")))
    // candidates that survive the augmented-space bucketing re-rank by
    // the EXACT inner product — overlapping pairs must agree with s5
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      exactIp.get(key).foreach(ip =>
        assert(math.abs(ip - r.getAs[Double]("inner_product")) < 1e-9))
    }
    val hits = rows.count(r =>
      exactSet((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / exact.length
    info(f"MIPS-LSH recall@5 vs exact MIPS: $recall%.2f")
    assert(recall >= 0.7, f"MIPS-LSH recall too low: $recall%.2f")
  }

  test("LSH ANN: structurally valid and overlaps brute-force") {
    val rows = Similarity.lshTopK(emb).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) => assert(rs.length <= 5) }
    val hits = rows.count(r => brute((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / 50
    info(f"LSH recall@5 vs brute force: $recall%.2f")
    // deterministic for this data+hash; 8 tables × 6 planes with
    // distance-1 multiprobe — a usable ANN needs ≥ 0.7 here
    assert(recall >= 0.7, f"LSH recall too low: $recall%.2f")
  }

  test("s19 recall curve: truth counts are 10·k, hits bounded, and the @5 point equals s15's micro recall") {
    val rows = SparkEntry.queries("s19_recall_curve")(spark, sf).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("recall"))).toMap
    assert(rows.keySet === Set(1L, 3L, 5L))
    rows.foreach { case (k, (t, h, rec)) =>
      assert(t === 10 * k, s"k=$k: every query has 5 exact neighbors")
      assert(h >= 0 && h <= t)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the k=5 point must agree with s15's per-query recalls micro-
    // averaged — same truth, same candidates, different readout grain
    val s15 = SparkEntry.queries("s15_recall_eval")(spark, sf).collect()
    val microHits = s15.map(_.getAs[Long]("hits")).sum
    assert(rows(5L)._2 === microHits, "s19@5 disagrees with s15's hits")
  }

  test("s20 probe curve: recall non-decreasing in nprobe, nprobe=3 matches ivfTopK, all-lists probe is exhaustive") {
    val emb = graft.Tables.embeddings(spark, sf)
    val rows = SparkEntry.queries("s20_ivf_probe_curve")(spark, sf).collect()
      .map(r => r.getAs[Long]("nprobe") ->
        (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("recall"))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows.values.forall { case (t, h, _) => t == 50L && h >= 0 && h <= t })
    // probing MORE lists can only add candidates → recall monotone
    assert(rows(1L)._3 <= rows(2L)._3 && rows(2L)._3 <= rows(3L)._3)
    // the nprobe=3 sweep point reproduces ivfTopK(nprobe=3)'s hits:
    // same codebook, same probe ranking, same rerank
    val truth = Similarity.bruteForceTopK(emb).select("q_id", "neighbor_id")
    val ivfHits = truth.join(
      Similarity.ivfTopK(emb).select("q_id", "neighbor_id"),
      Seq("q_id", "neighbor_id")).count()
    assert(rows(3L)._2 === ivfHits, "s20@3 disagrees with ivfTopK(nprobe=3)")
    // probing ALL 10 lists makes the scan exhaustive → recall 1.0
    val all = Similarity.ivfProbeCurve(emb, nprobes = Seq(10)).collect().head
    assert(all.getAs[Double]("recall") === 1.0)
  }

  test("graph ANN: beam walk over the kNN graph; recall vs brute force; monotone in hops") {
    // the served configuration (s13's registered entry): EXACT-built
    // edges — the r19 verdict #6 floor lift; the LSH-built graph
    // stays available as the cheap-build path but is not the one the
    // recall floor is pinned on
    val exactEdges = Similarity.exactKnnGraphEdges(emb).cache()
    val rows = Similarity.graphSearch(emb,
      prebuiltEdges = Some(exactEdges)).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      // ranks are 1..k dense and neighbors never include the query
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length).toSeq)
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id")))
    val hits = rows.count(r =>
      brute((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / 50
    info(f"graph-ANN recall@5 vs brute force: $recall%.2f")
    // the r19 verdict #6 floor: exact edges must lift the walk past
    // the LSH build's 0.60 ceiling
    assert(recall >= 0.75, f"graph recall too low: $recall%.2f")
    // visited set only grows with hops → recall is monotone: the
    // default 8-hop walk must find at least what the 5-hop walk does
    val fewer = Similarity.graphSearch(emb, hops = 5,
      prebuiltEdges = Some(exactEdges)).collect()
    val hits5 = fewer.count(r =>
      brute((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    info(f"graph-ANN recall@5 at 5 hops: ${hits5.toDouble / 50}%.2f")
    assert(hits >= hits5, s"recall must not drop with more hops: $hits < $hits5")
  }

  test("graph ANN fixpoint early-exit ≡ full 8-hop unroll (r21), and more hops stay a no-op") {
    // graphSearch (r21) drives the beam walk from a driver-collected
    // frontier and EXITS once frontier_k == frontier_{k-1} — claiming
    // the remaining hops are provably no-ops. Pin that claim against a
    // REFERENCE full unroll: the pre-r21 loop shape (always `hops`
    // rounds, distinct-candidates, no early exit), reimplemented here
    // verbatim-semantics, must agree row-for-row after the same rerank.
    import graft.functions.TopKAggregate.topkByScore
    import graft.functions.VectorFunctions.dot
    import org.apache.spark.sql.DataFrame
    val exactEdges = Similarity.exactKnnGraphEdges(emb).cache()
    def fullUnroll(k: Int, nQueries: Int, beam: Int, hops: Int,
        nEntries: Int): DataFrame = {
      import spark.implicits._
      val c = Similarity.corpus(emb)
      val q = c.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val firstIds = c.select("vec_id").orderBy("vec_id").limit(nEntries + 1)
        .collect().map(_.getLong(0))
      var frontier = q.select(col("q_id"))
        .crossJoin(broadcast(firstIds.toSeq.toDF("vec_id")))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy("q_id")
        .agg(slice(sort_array(collect_list(col("vec_id"))), 1, nEntries).as("vs"))
        .select(col("q_id"), explode(col("vs")).as("vec_id"))
      var visited: DataFrame = null
      for (_ <- 1 to hops) {
        val cand = frontier
          .unionByName(exactEdges.join(broadcast(frontier),
              exactEdges("src") === frontier("vec_id"))
            .select(col("q_id"), col("dst").as("vec_id")))
          .filter(col("vec_id") =!= col("q_id"))
          .distinct()
        val scored = c.select(col("vec_id"), col("v"), col("nrm"))
          .join(broadcast(cand), Seq("vec_id"))
          .join(broadcast(q), Seq("q_id"))
          .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
          .select("q_id", "vec_id", "cos")
          .localCheckpoint()
        visited = if (visited == null) scored else visited.unionByName(scored)
        frontier = scored.groupBy("q_id")
          .agg(topkByScore(round(col("cos"), 9), col("cos"), col("vec_id"), beam).as("tk"))
          .select(col("q_id"), explode(col("tk")).as("t"))
          .select(col("q_id"), col("t.id").as("vec_id"))
      }
      val dedup = visited.groupBy("q_id", "vec_id").agg(min("cos").as("cos"))
      Similarity.rerankForSpec(dedup, k)
    }
    def canon(df: DataFrame): Seq[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
        .sortBy(t => (t._1, t._2)).toSeq
    val fast = Similarity.graphSearch(emb, prebuiltEdges = Some(exactEdges))
    val slow = fullUnroll(k = 5, nQueries = 10, beam = 16, hops = 8, nEntries = 8)
    assert(canon(fast) == canon(slow),
      "early-exit walk must be row-identical to the full 8-hop unroll")
    // fixpoint ⇒ extending the hop budget changes nothing
    val more = Similarity.graphSearch(emb, hops = 20,
      prebuiltEdges = Some(exactEdges))
    assert(canon(fast) == canon(more),
      "post-fixpoint hops must be no-ops")
    exactEdges.unpersist()
  }

  test("s14 embedding drift: identical halves read cos 1, a planted rotation reads below") {
    import spark.implicits._
    // label "same": even and odd vectors identical → centroid cos 1.
    // label "moved": odd half rotated 90° in the (e1, e2) plane →
    // centroid cos 0 (orthogonal centroids).
    val vecs =
      (0 until 8).map(i => (i.toLong, "same", Array(1.0f, 2.0f, 0.5f, 0.0f))) ++
      (0 until 8).map { i =>
        val v = if (i % 2 == 0) Array(1.0f, 0.0f, 0.0f, 0.0f)
          else Array(0.0f, 1.0f, 0.0f, 0.0f)
        (100L + i, "moved", v)
      }
    val df = vecs.toDF("vec_id", "label", "embedding")
    val out = Similarity.embeddingDrift(df).collect()
      .map(r => r.getAs[String]("label") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("centroid_cos")))).toMap
    assert(out("same") == ((4L, 4L, 1.0)), out.toString)
    assert(out("moved")._3 == 0.0, s"orthogonal centroids: ${out("moved")}")
  }

  test("filtered ANN: neighbors share the query's label; recall vs exact filtered top-k") {
    val rows = Similarity.filteredLshTopK(emb).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) => assert(rs.length <= 5) }
    val labels = Similarity.corpus(emb).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    // predicate correctness: the filter constrains the RESULT, not
    // just the ranking — every emitted neighbor matches the predicate
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) == labels(r.getAs[Long]("q_id")),
        s"cross-label neighbor: $r")
    }
    // exact filtered ground truth: label-constrained brute force
    val c = Similarity.corpus(emb)
    val q = c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val exact = c.join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", graft.functions.VectorFunctions.dot(col("v"), col("qv")) /
        (col("nrm") * col("qn")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(round(col("cos"), 9).desc, col("vec_id").asc)))
      .filter(col("rk") <= 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exactSet = exact.toSet
    val hits = rows.count(r => exactSet((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / exact.length
    info(f"filtered-ANN recall@5 vs exact filtered: $recall%.2f")
    // deterministic for this data+hash: 0.76 at sf0.001, 0.94 at sf0.01
    assert(recall >= 0.7, f"filtered recall too low: $recall%.2f")
  }

  test("filtered ANN on a label-partitioned corpus: the predicate prunes partitions dynamically") {
    // the 100 TB claim behind s9's semi-join prune, plan-proven: when
    // the corpus table is PARTITIONED by the filter column, Spark's
    // dynamic partition pruning turns the broadcast semi-join into a
    // runtime PartitionFilter on the scan — non-matching label
    // partitions are never read, let alone bucketed
    val dir = java.nio.file.Files.createTempDirectory("emb_part").toString + "/t"
    emb.write.partitionBy("label").parquet(dir)
    val part = spark.read.parquet(dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val out = Similarity.filteredLshTopK(part, nQueries = 3)
    val p = out.queryExecution.executedPlan.toString()
    assert(p.contains("dynamicpruning"), p.take(3000))
    // and the pruned-table result is the plain-table result
    val plain = Similarity.filteredLshTopK(emb, nQueries = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).sorted
    val pruned = out.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).sorted
    assert(pruned.toSeq == plain.toSeq)
  }

  test("IVF ANN: structurally valid and overlaps brute-force") {
    val rows = Similarity.ivfTopK(emb).collect()
    assert(rows.nonEmpty)
    val hits = rows.count(r => brute((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / 50
    info(f"IVF recall@5 (nprobe=3/10) vs brute force: $recall%.2f")
    assert(recall >= 0.2, f"IVF recall collapsed: $recall%.2f")
  }

  test("IVF-PQ: byte-packed index is dim×8/m smaller than raw vectors") {
    val (index, codebooks, _) = Similarity.ivfpqIndex(emb)
    // codebooks: m=8 subspaces × nCodes=16 codes × sub=8 dims
    assert(codebooks.length == 8)
    assert(codebooks.forall(_.length == 16))
    assert(codebooks.forall(_.forall(_.length == 8)))
    // index schema: codes are BYTES (the 256-code production layout)
    val ct = index.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(ct.elementType == org.apache.spark.sql.types.ByteType, ct)
    val rows = index.collect()
    assert(rows.length == 500) // one code row per corpus vector
    rows.foreach { r =>
      assert(r.getSeq[Byte](r.fieldIndex("codes")).length == 8)
      assert(r.getAs[Double]("rnrm") > 0.0)
    }
    // the compression claim, computed: dim doubles vs m code bytes
    val rawBytes = 64 * 8
    val codeBytes = 8
    assert(rawBytes / codeBytes == 64)
    // and the reconstruction is faithful enough to order neighbors:
    // rnrm within 50% of the true norm for every vector (a loose
    // sanity bound — the recall spec is the real quality gate)
    val trueNrm = Similarity.corpus(emb).select(col("vec_id"), col("nrm"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val recNrm = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("rnrm")).toMap
    recNrm.foreach { case (id, rn) =>
      assert(math.abs(rn - trueNrm(id)) / trueNrm(id) < 0.5, s"vec $id: $rn vs ${trueNrm(id)}")
    }
  }

  test("IVF-PQ ANN: recall vs brute force; emitted cosines are exact (refine step)") {
    val rows = Similarity.ivfpqTopK(emb).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) => assert(rs.length <= 5) }
    val hits = rows.count(r => brute((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / 50
    info(f"IVF-PQ recall@5 vs brute force: $recall%.2f")
    assert(recall >= 0.6, f"IVF-PQ recall too low: $recall%.2f")
    // the final re-rank is exact, so overlapping pairs carry the
    // brute-force cosine bit-for-bit
    val b = Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      b.get(key).foreach(c => assert(c == r.getAs[Double]("cosine"), key))
    }
  }

  test("IVF-PQ index round-trips through parquet: loaded-index queries equal in-memory") {
    val (index, codebooks, centroids) = Similarity.ivfpqIndex(emb)
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.savePqIndex(dir, index, codebooks, centroids)
    val (li, lcb, lc) = Similarity.loadPqIndex(spark, dir)
    assert(lcb == codebooks, "codebooks drifted through the round-trip")
    val direct = Similarity.ivfpqQuery(emb, index, codebooks, centroids)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).sorted
    val loaded = Similarity.ivfpqQuery(emb, li, lcb, lc)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).sorted
    assert(direct.toSeq == loaded.toSeq)
  }

  test("IVF-PQ upsert: increment ≡ frozen-codebook rebuild; replace semantics; grown-index recall") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val (index, books, cents) = Similarity.ivfpqIndex(base)
    val grown = Similarity.upsertPqIndex(index, books, cents, batch)
    // row-for-row identical to encoding the WHOLE corpus against the
    // same frozen codebooks — encoding determinism makes the
    // increment≡rebuild contract exact, not approximate
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("list_id"),
        r.getSeq[Byte](r.fieldIndex("codes")).toList, r.getAs[Double]("rnrm")))
      .sortBy(_._1).toSeq
    val rebuilt = Similarity.encodePq(Similarity.corpus(emb), books, cents)
    assert(canon(grown) == canon(rebuilt))
    // UPSERT, not append: re-sending the batch replaces, never dups
    val again = Similarity.upsertPqIndex(grown, books, cents, batch)
    assert(again.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(again.count() == emb.count())
    // the grown index serves queries at the s8 recall floor
    val rows = Similarity.ivfpqQuery(emb, grown, books, cents).collect()
    val hits = rows.count(r =>
      brute((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / 50
    info(f"upserted-index IVF-PQ recall@5 vs brute force: $recall%.2f")
    assert(recall >= 0.6, f"upserted-index recall too low: $recall%.2f")
    // DELETE completes the CRUD cycle: dropped ids leave the index
    // entirely and never surface as neighbors again
    val shrunk = Similarity.deleteFromPqIndex(grown, batch.select("vec_id"))
    assert(canon(shrunk) == canon(index), "delete(upsert(batch)) != original")
    val afterDel = Similarity.ivfpqQuery(emb, shrunk, books, cents).collect()
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(afterDel.forall(r => !batchIds(r.getAs[Long]("neighbor_id"))))
  }

  test("s22 pq delete: tombstoned index == per-row-filtered encode; deleted ids never surface; idempotent") {
    val (index, books, cents) = Similarity.ivfpqIndex(emb)
    val dels = emb.filter(col("vec_id") % 9 === 0).select("vec_id")
    val pruned = Similarity.deleteFromPqIndex(index, dels)
    // encoding is per-row deterministic under frozen codebooks, so the
    // left-anti delete equals filtering the full encode row-for-row
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("list_id"),
        r.getSeq[Byte](r.fieldIndex("codes")).toList, r.getAs[Double]("rnrm")))
      .sortBy(_._1).toSeq
    assert(canon(pruned) ==
      canon(Similarity.encodePq(
        Similarity.corpus(emb.filter(col("vec_id") % 9 =!= 0)), books, cents)))
    // deletes are idempotent (left-anti of an absent id is a no-op)
    assert(canon(Similarity.deleteFromPqIndex(pruned, dels)) == canon(pruned))
    // the registered entry's results never name a deleted id
    val rows = SparkEntry.queries("s22_pq_delete")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("neighbor_id") % 9 != 0))
  }

  test("kNN classify: planted clusters vote correctly; ties break to the smallest label") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val rows = Seq(
      (0L, v(1, 0.01), 1), // query inside cluster 1
      (1L, v(0.01, 1), 2), // query inside cluster 2
      (10L, v(1, 0), 1), (11L, v(0.99, 0.05), 1), (12L, v(0.98, -0.03), 1),
      (13L, v(0, 1), 2), (14L, v(0.05, 0.99), 2), (15L, v(-0.03, 0.98), 2))
      .toDF("vec_id", "embedding", "label")
    // k=5 over 3+3 train vectors: the home cluster out-votes 3:2
    val out = Similarity.knnClassify(rows, k = 5, nQueries = 2).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("predicted_label"), r.getAs[Long]("votes"),
          r.getAs[Boolean]("correct")))).toMap
    assert(out == Map(0L -> ((1L, 3L, true)), 1L -> ((2L, 3L, true))))
    // k=6 ties every vote 3:3 — both queries fall to the SMALLEST label
    val tie = Similarity.knnClassify(rows, k = 6, nQueries = 2).collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("predicted_label")).toMap
    assert(tie == Map(0L -> 1L, 1L -> 1L))
  }

  test("ANN cosines agree with brute-force for overlapping pairs") {
    val b = Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val l = Similarity.lshTopK(emb).collect()
    l.foreach { r =>
      val k = (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))
      b.get(k).foreach(c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-9))
    }
  }

  test("semantic dedup auto-k: blocking grows with the corpus; planted dups still collapse") {
    // policy math: k tracks n / targetClusterSize within the bounds
    assert(Similarity.autoK(0, 1000) == 1)
    assert(Similarity.autoK(999, 1000) == 1)
    assert(Similarity.autoK(10_000, 1000) == 10)
    assert(Similarity.autoK(10_001, 1000) == 11)
    assert(Similarity.autoK(1_000_000_000L, 1000) == 65536) // broadcast bound
    // end-to-end at TWO corpus sizes: the doubled corpus gets double
    // the clusters, keeping the mean cluster width at the target
    val small = emb
    val big = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + 100000L))
    val n = small.count()
    val target = math.max(1, (n / 10).toInt)
    for ((corpus, cn) <- Seq((small, n), (big, 2 * n))) {
      val k = Similarity.autoK(cn, target)
      assert(k == ((cn + target - 1) / target).toInt)
      val out = Similarity.semanticDedupAuto(corpus, tau = 0.9,
        targetClusterSize = target).collect()
      assert(out.length == cn)
      val sizes = out.groupBy(_.getAs[Long]("cluster_id")).values.map(_.length)
      // k-means is unbalanced but bounded-on-average: the mean width
      // must stay near the target as the corpus doubles (the fixed-k
      // failure mode is mean width doubling with n)
      val mean = sizes.sum.toDouble / sizes.size
      assert(mean <= 4.0 * target,
        f"mean cluster width $mean%.1f vs target $target (k=$k, n=$cn)")
    }
    // planted byte-identical copy still collapses under auto-k
    val planted = emb.filter(col("vec_id") === 3L)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val out = Similarity.semanticDedupAuto(emb.unionByName(planted),
      tau = 0.9, targetClusterSize = target).collect()
    val row = out.find(_.getAs[Long]("vec_id") == 1003L).get
    assert(row.getAs[String]("status") == "semantic_dup")
    assert(row.getAs[Long]("canonical_id") < 1003L)
  }

  test("t17 embeddings feed semantic dedup end-to-end: text dups collapse") {
    import graft.functions.NativeTextExpressions.featureHashEmbed
    import spark.implicits._
    // 0 and 7 are byte-identical texts; the rest are distinct
    val texts = (0L until 8L).map { i =>
      val body = if (i == 7L) "the same exact duplicated sentence body"
        else if (i == 0L) "the same exact duplicated sentence body"
        else s"unique document number $i talking about topic ${"abcdefg" (i.toInt)}"
      (i, body)
    }
    val emb = texts.toDF("vec_id", "text")
      .select(col("vec_id"), lit("doc").as("label"),
        featureHashEmbed(lower(col("text")), 64).as("embedding"))
    val out = Similarity.semanticDedup(emb, tau = 0.95, k = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("canonical_id"))).toMap
    assert(out(7L) == (("semantic_dup", 0L)),
      s"identical text must collapse through the embedding bridge: $out")
    assert(out(0L)._1 == "kept")
    (1L until 7L).foreach(i => assert(out(i)._1 == "kept", s"doc $i: $out"))
  }

  test("kNN join: every vector ranked, recall vs the exact all-pairs join") {
    val k = 3
    val rows = Similarity.knnJoin(emb, k = k).collect()
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("vec_id")))
    // ≤ k ranked neighbors per vector, cosine descending
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (_, rs) =>
      assert(rs.length <= k)
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // exact reference: brute-force top-k for EVERY vector
    import graft.operators.Similarity.corpus
    val c = corpus(emb).select("vec_id", "v", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val exact = c.flatMap { case (i, vi, ni) =>
      c.filter(_._1 != i).map { case (j, vj, nj) =>
        val dot = vi.zip(vj).map { case (a, b) => a * b }.sum
        (i, j, dot / (ni * nj))
      }.sortBy { case (_, j, cos) => (-cos, j) }.take(k)
    }.map { case (i, j, _) => (i, j) }.toSet
    val got = rows.map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"kNN-join recall@$k vs exact: $recall%.2f")
    assert(recall >= 0.6, f"kNN join recall too low: $recall%.2f")
    // pair symmetry of the candidate generation: if (a,b) is in the
    // result and b ranks a's bucket, the mirrored pair carries the
    // same cosine
    val cosByPair = rows.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    cosByPair.foreach { case ((a, b), cab) =>
      cosByPair.get((b, a)).foreach(cba => assert(cab == cba)) }
  }

  test("kernel swap: unigram-hash embeddings drive semantic dedup + LSH unchanged") {
    import graft.functions.NativeTextExpressions.unigramHashEmbed
    import spark.implicits._
    // same fixture as the t17 end-to-end test, new kernel: 0 and 7 are
    // byte-identical texts, everything else distinct
    val texts = (0L until 8L).map { i =>
      val body = if (i == 7L || i == 0L) "the same exact duplicated sentence body"
        else s"unique document number $i talking about topic ${"abcdefg" (i.toInt)}"
      (i, body)
    }
    val emb2 = texts.toDF("vec_id", "text")
      .select(col("vec_id"), lit("doc").as("label"),
        unigramHashEmbed(lower(col("text")), 64).as("embedding"))
    // d13's core consumes the new kernel with no changes
    val out = Similarity.semanticDedup(emb2, tau = 0.95, k = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("status"), r.getAs[Long]("canonical_id"))).toMap
    assert(out(7L) == (("semantic_dup", 0L)), s"kernel swap broke dedup: $out")
    (0L until 7L).foreach(i => assert(out(i)._1 == "kept", s"doc $i: $out"))
    // s2's core consumes it too: structurally valid ranked neighbors
    val lsh = Similarity.lshTopK(emb2, k = 2, nQueries = 3).collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id")))
    // the identical pair is each other's top LSH hit at cosine 1
    val hit = lsh.find(r => r.getAs[Long]("q_id") == 0L &&
      r.getAs[Long]("neighbor_id") == 7L)
    assert(hit.exists(r => math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9),
      s"identical texts must be cosine-1 LSH neighbors: ${lsh.mkString(",")}")
  }

  test("semantic dedup: labels brute-force-verified; planted duplicates collapse") {
    val tau = 0.9
    // plant byte-identical copies of two vectors under new high ids
    val planted = emb.filter(col("vec_id").isin(3L, 7L))
      .withColumn("vec_id", col("vec_id") + 1000L)
    val corpus = emb.unionByName(planted)
    val out = Similarity.semanticDedup(corpus, tau = tau).collect()
    assert(out.length == corpus.count())
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    // an identical copy always has a qualifying lower-id mate
    Seq(1003L, 1007L).foreach { id =>
      assert(byId(id).getAs[String]("status") == "semantic_dup")
      assert(byId(id).getAs[Long]("canonical_id") < id)
      assert(byId(id).getAs[Double]("cos_to_canonical") >= tau - 1e-9)
    }
    // brute-force every label against the emitted clustering
    val vecs = corpus.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val clusterOf = out.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    out.foreach { r =>
      val i = r.getAs[Long]("vec_id")
      val qual = clusterOf.keysIterator
        .filter(j => j < i && clusterOf(j) == clusterOf(i))
        .filter(j => r9(cos(vecs(i), vecs(j))) >= BigDecimal(tau))
        .toSeq
      if (qual.isEmpty) {
        assert(r.getAs[String]("status") == "kept", s"vec $i")
        assert(r.getAs[Long]("canonical_id") == i)
        assert(r.isNullAt(r.fieldIndex("cos_to_canonical")))
      } else {
        assert(r.getAs[String]("status") == "semantic_dup", s"vec $i")
        assert(r.getAs[Long]("canonical_id") == qual.min, s"vec $i")
      }
    }
  }

  test("s15 recall harness: hits are the exact intersection of s1 and s2") {
    // independent recompute: collect both retrievers' (q, neighbor)
    // sets and intersect in plain Scala
    val out = SparkEntry.queries("s15_recall_eval")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("hits"),
        r.getAs[Double]("recall"))).toSeq
    val ex = operators.Similarity.bruteForceTopK(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ap = operators.Similarity.lshTopK(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(out.map(_._1).toSet === ex.map(_._1))
    out.foreach { case (q, hits, recall) =>
      val expect = ex.count(p => p._1 == q && ap(p))
      assert(hits === expect.toLong, s"query $q")
      val depth = ex.count(_._1 == q)
      assert(math.abs(recall - hits.toDouble / depth) < 1e-9, s"query $q")
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("s17 kNN regression: prediction is the exact train-top-5 mean") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    // independent in-memory reference: train-split cosine ranking with
    // the engine's tie-break, then a plain-Scala mean of the 5 labels
    val rows = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label").toLong, v)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val train = rows.filter(_._1 >= 10)
    val got = operators.Similarity.knnRegress(emb).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Double]("predicted_value"), r.getAs[Long]("true_value"))))
      .toMap
    rows.filter(_._1 < 10).foreach { case (q, qLab, qv) =>
      val top = train
        .map { case (id, lab, v) =>
          (math.floor(cos(qv, v) * 1e9 + 0.5) / 1e9, id, lab) }
        .sortBy { case (c, id, _) => (-c, id) }.take(5)
      val mean = top.map(_._3).sum.toDouble / top.length
      val (pred, trueV) = got(q)
      assert(math.abs(pred - math.floor(mean * 1e6 + 0.5) / 1e6) < 1e-9,
        s"query $q")
      assert(trueV === qLab, s"query $q")
    }
  }

  test("s18 centroid classifier: planted separable labels classify exactly") {
    import spark.implicits._
    // label 0 train vectors cluster on axis-0, label 1 on axis-1;
    // queries 0/1 sit near their own cluster
    val rows = Seq(
      (0L, Array(0.9f, 0.1f), 0), (1L, Array(0.1f, 0.9f), 1),
      (10L, Array(1.0f, 0.0f), 0), (11L, Array(0.8f, 0.2f), 0),
      (12L, Array(0.0f, 1.0f), 1), (13L, Array(0.2f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = operators.Similarity.centroidClassify(rows, nQueries = 2)
      .collect().map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("predicted_label"), r.getAs[Boolean]("correct"))))
      .toMap
    assert(got(0L) == ((0L, true)) && got(1L) == ((1L, true)))
  }

  test("sq8 recall: degenerate dims survive, well-separated clusters keep recall 1.0") {
    import spark.implicits._
    // dim 0 is CONSTANT (hi = lo → must reconstruct to the constant,
    // not NaN); dims 1–2 put vectors on distinct angles in two
    // well-separated clusters, so 255-level quantization cannot flip
    // any top-k membership
    val rows = (0L until 12L).map { i =>
      val (cx, cy) = if (i % 2 == 0) (10.0f, 0.0f) else (0.0f, 10.0f)
      (i, Array(1.0f, cx + (i / 2) * 0.1f, cy + (i / 2) * 0.07f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val out = operators.Similarity.sq8Recall(rows, k = 3, nQueries = 4)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("hits"),
        r.getAs[Double]("recall")))
    assert(out.length == 4)
    for ((q, h, rec) <- out) {
      assert(!rec.isNaN, s"q$q recall NaN — degenerate dim broke the quantizer")
      assert(h == 3L && rec == 1.0, s"q$q: hits=$h recall=$rec")
    }
    // and on the real table the compression must stay near-lossless
    val real = SparkEntry.queries("s21_sq8_recall")(spark, sf)
      .agg(avg("recall")).head().getDouble(0)
    assert(real >= 0.6, s"mean SQ8 recall $real — quantizer broken")
  }
}
