package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Degenerate-input hardening: a 100 TB pipeline routinely sees empty
  * shards/partitions — every operator must return an empty (or
  * correctly-degenerate) result, not throw.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String, String, String, Long)]
    .toDF("doc_id", "text", "lang", "source", "n_chars")
  private lazy val noEvents = Tables.events(spark, sf).limit(0)
  private lazy val noEmb = Tables.embeddings(spark, sf).limit(0)

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.exactDedup(noDocs).count() == 0)
    assert(Dedup.minhashPairs(noDocs).count() == 0)
    assert(Dedup.minhashPairsBlocked(noDocs).count() == 0)
    assert(Dedup.ngramJaccard(noDocs).count() == 0)
    assert(Dedup.incrementalDedup(noDocs, noDocs).count() == 0)
    assert(Dedup.dupClusters(noDocs).count() == 0)
    assert(Dedup.bloomIncrementalDedup(noDocs, noDocs).count() == 0)
    // empty corpus, live batch: nothing can be dup_of_corpus
    val batch = Seq((1L, "some text here", "en", "s0", 14L),
      (2L, "some text here", "en", "s0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val st = Dedup.bloomIncrementalDedup(noDocs, batch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(st == Map(1L -> "new", 2L -> "dup_in_batch"))
  }

  test("similarity returns empty on empty embeddings (MIPS included)") {
    assert(Similarity.mipsTopK(noEmb).count() == 0)
  }

  test("packing/sampling/mixture handle empty docs") {
    assert(Packing.sequencePack(noDocs).count() == 0)
    assert(Packing.stratifiedSample(noDocs).count() == 0)
    assert(Packing.mixturePlan(noDocs).count() == 0)
    assert(Packing.tokenBudgetSample(noDocs).count() == 0)
    assert(Packing.temperatureMixture(noDocs).count() == 0)
  }

  test("round-11 operators handle empty docs") {
    assert(Dedup.substringDedup(noDocs).count() == 0)
    assert(Dedup.copyCap(noDocs).count() == 0)
    assert(TextQueries.noveltyScore(noDocs).count() == 0)
    assert(Packing.curriculumPhases(noDocs).count() == 0)
    assert(Packing.lengthBatches(noDocs).count() == 0)
    val noMedia = Multimodal.mediaTable(noDocs)
    assert(Multimodal.extractFeatures(spark, noMedia,
      new Multimodal.BmpThumbCodec(2, 2)).count() == 0)
    assert(Multimodal.extractFeatures(spark, noMedia,
      new Multimodal.FrameSampleCodec()).count() == 0)
  }

  test("round-13 retrieval/ANN/closure operators handle empty inputs") {
    assert(Retrieval.bm25TopK(noDocs).count() == 0)
    assert(Retrieval.hybridRrf(noDocs, noEmb).count() == 0)
    assert(Similarity.filteredLshTopK(noEmb).count() == 0)
    assert(noDocs.agg(graft.functions.FrequentItemsAggregate
      .frequentItems(col("source"), 8).as("hh"))
      .select(explode(col("hh"))).count() == 0)
    // an empty closure has no subtree to move — the cycle guard
    // passes vacuously and the result is empty
    val noClosure = HierarchyQueries.dimension(spark, sf).closurePairs.limit(0)
    assert(HierarchyDimension.moveSubtreeClosure(noClosure, "x", "y").count() == 0)
  }

  test("perplexity filter and contribution rollup handle empty inputs") {
    assert(TextQueries.perplexityFilter(noDocs).count() == 0)
    val dim = HierarchyQueries.dimension(spark, sf)
    val facts = HierarchyAgg.salesFacts(spark, sf).limit(0)
      .withColumn("leaf_key", col("l_partkey"))
    assert(HierarchyAgg.contributionRollup(facts, dim).count() == 0)
  }

  test("boilerplate, corpus prep and what-if delta handle empty inputs") {
    assert(TextQueries.boilerplate(noDocs).count() == 0)
    assert(Packing.corpusPrep(noDocs).count() == 0)
    // an empty edit (identical dims) previews zero changed rows
    val dim = HierarchyQueries.dimension(spark, sf)
    val facts = HierarchyAgg.salesFacts(spark, sf)
    val mv = HierarchyAgg.rollupMv(facts, dim.aggregationDim)
    assert(HierarchyAgg.whatIfDelta(mv, mv, dim, dim).count() == 0)
    // and an empty MV pair yields an empty preview
    val noMv = mv.limit(0)
    assert(HierarchyAgg.whatIfDelta(noMv, noMv, dim, dim).count() == 0)
  }

  test("historyClosure returns an empty closure for an empty versioned node table") {
    val noNodes = Seq.empty[(String, Long, String, String, String,
        java.sql.Date, java.sql.Date)]
      .toDF("node_id", "node_natural_key", "node_name", "level_name",
        "parent_node_id", "valid_from", "valid_to")
    val hc = HierarchyDimension.historyClosure(noNodes)
    assert(hc.count() == 0)
    assert(hc.columns.toSeq ==
      Seq("ancestor_node_id", "descendant_node_id", "valid_from", "valid_to"))
  }

  test("embedding near-dup and similarity return empty on empty embeddings") {
    assert(Dedup.embeddingNearDup(noEmb).count() == 0)
    assert(Dedup.embeddingNearDup(noEmb, nPlanes = 0).count() == 0)
    assert(Similarity.bruteForceTopK(noEmb).count() == 0)
    assert(Similarity.semanticDedup(noEmb).count() == 0)
  }

  test("streaming batch forms and sessionize handle empty events") {
    assert(graft.streaming.StreamingOps.windowedAgg(noEvents).count() == 0)
    assert(graft.streaming.StreamingOps.sessionize(noEvents).count() == 0)
  }

  test("hierarchical rollup of empty facts still emits zero-count rows per node") {
    val dim = HierarchyQueries.dimension(spark, sf)
    val facts = HierarchyAgg.salesFacts(spark, sf).limit(0)
    val out = HierarchyAgg.hierarchicalRollup(facts, dim.aggregationDim)
    // no fact rows → no groups survive the inner closure join
    assert(out.count() == 0)
  }

  test("MV repair with identical dims returns the re-keyed MV unchanged") {
    val dim = HierarchyQueries.dimension(spark, sf)
    val facts = HierarchyAgg.salesFacts(spark, sf)
    val mv = HierarchyAgg.rollupMv(facts, dim.aggregationDim)
    // nothing invalidated → repair ≡ the original MV (same numbering)
    val repaired = HierarchyAgg.repairRollupMv(mv, facts, dim, dim)
    val a = mv.orderBy("ancestor_node_sort_order", "customer_id").collect()
    val b = repaired.orderBy("ancestor_node_sort_order", "customer_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("MV repair of an empty-fact MV yields an empty MV") {
    val v1 = HierarchyQueries.dimension(spark, sf)
    val v2 = HierarchyQueries.asOfDimension(spark, sf, "1996-06-01")
    val none = HierarchyAgg.salesFacts(spark, sf).limit(0)
    val mv = HierarchyAgg.rollupMv(none, v1.aggregationDim)
    assert(HierarchyAgg.repairRollupMv(mv, none, v1, v2).count() == 0)
  }

  test("asOfRange on an empty versioned node table returns empty") {
    val none = HierarchyQueries.versionedRegionNationNodes(spark, sf).limit(0)
    assert(HierarchyDimension.asOfRange(none,
      to_date(lit("1995-01-01")), to_date(lit("1997-01-01"))).count() == 0)
  }

  test("round-4 operators handle empty inputs") {
    assert(TextQueries.piiScrub(noDocs).count() == 0)
    assert(TextQueries.tfidfTopTerms(noDocs).count() == 0)
    assert(DedupQueries.sourceOverlap(noDocs).count() == 0)
    assert(DedupQueries.canonicalDocs(noDocs, minJaccard = 0.5).count() == 0)
    assert(graft.streaming.StreamingOps.slidingWindowAgg(noEvents).count() == 0)
    val adim = HierarchyQueries.dimension(spark, sf).aggregationDim
    val noFacts = HierarchyAgg.salesFacts(spark, sf).limit(0)
    // empty MV + empty delta → empty rollup, not a throw
    assert(HierarchyAgg.finalizeRollup(
      HierarchyAgg.mergeRollupMv(
        HierarchyAgg.rollupMv(noFacts, adim), noFacts, adim), adim).count() == 0)
  }

  test("round-5 operators handle empty inputs") {
    val noDocs = Tables.documents(spark, sf).limit(0)
    val noEmb = Tables.embeddings(spark, sf).limit(0)
    assert(graft.operators.Packing.splitShards(noDocs).count() == 0)
    assert(graft.operators.Similarity.rangeSearch(noEmb).count() == 0)
  }

  test("round-7 operators handle empty inputs") {
    val noDocs = Tables.documents(spark, sf).limit(0)
    // fenced-threshold paths: empty edge/pair sets flow through
    assert(Dedup.jaccardClusters(noDocs, minJaccard = 0.05).count() == 0)
    assert(graft.operators.DedupQueries.canonicalDocs(noDocs, minJaccard = 0.05).count() == 0)
    // topk-rows aggregate over an empty frame yields no groups
    assert(graft.operators.TextQueries.tfidfTopTerms(noDocs).count() == 0)
    // dynamic pivot discovers an empty domain → group cols only, 0 rows
    val dp = graft.operators.Olap.dynamicPivot(noDocs,
      Seq("lang"), "source", count(lit(1)), fill = Some(lit(0L)))
    assert(dp.columns.toSeq == Seq("lang") && dp.count() == 0)
  }

  test("wedgeStats and its readouts return empty on an empty edge list") {
    val noEdges = Seq.empty[(Long, Long, Long)].toDF("a", "b", "w")
    val adjDeg = Graph.withOutDeg(Graph.adjacency(noEdges))
    val w = Graph.wedgeStats(adjDeg)
    assert(w.count() == 0)
    assert(Graph.commonNeighborsFrom(w, noEdges, adjDeg).count() == 0)
    assert(Graph.adamicAdarFrom(w, noEdges).count() == 0)
    // the peel loops early-exit on the empty fixpoint without error
    assert(Graph.kcorePeel(adjDeg).count() == 0)
    assert(Graph.ktrussPeel(noEdges.select(col("a"), col("b"))).count() == 0)
  }

  test("connected components with no edges labels every node as itself") {
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component_id")).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("round-13 operators handle empty inputs") {
    // poly-arithmetic sketches on an empty corpus
    assert(Dedup.minhashLsh(noDocs).count() == 0)
    assert(Dedup.simhashDedup(noDocs).count() == 0)
    // empty corpus → empty codebook → every batch row unclassifiable;
    // an empty BATCH against a live corpus returns empty, not a throw
    val emb = Tables.embeddings(spark, sf)
    assert(Similarity.incrementalSemanticDedup(noEmb, noEmb).count() == 0)
    assert(Similarity.incrementalSemanticDedup(emb, noEmb).count() == 0)
    // JPEG codec over an empty media table
    assert(Multimodal.extractFeatures(spark, Multimodal.mediaTable(noDocs),
      new Jpeg.JpegCodec).count() == 0)
  }

  test("third-session operators handle empty inputs") {
    // OLS on nothing → no groups; on a single point → degenerate nulls
    assert(Olap.olsByGroup(noDocs.select(col("lang"),
      col("n_chars").as("x"), col("n_chars").as("y")),
      Seq("lang"), col("x"), col("y")).count() == 0)
    // phash variants / pairs over an empty corpus
    assert(Phash.hashedVariants(spark, noDocs).count() == 0)
    assert(Phash.phashPairs(
      Seq.empty[(Long, Long)].toDF("doc_id", "phash")).count() == 0)
    // streaming EWMA state machine over an empty event table
    assert(graft.streaming.StreamingOps.ewmaFMGWS(spark, noEvents).count() == 0)
    // spectrum codec over an empty media table
    assert(Multimodal.extractFeatures(spark, Multimodal.mediaTable(noDocs),
      new Multimodal.SpectrumCodec(64)).count() == 0)
  }

  test("round-18 operators handle empty inputs") {
    val noMedia = Seq.empty[(Long, Array[Byte], String, Int, Int)]
      .toDF("doc_id", "payload", "media_type", "width", "height")
    // permissive decode over nothing: no rows, no quarantine records
    assert(Multimodal.extractFeaturesQuarantine(spark, noMedia,
      new Multimodal.BmpCodec).count() == 0)
    // sniffing tiler, index and probe over an empty corpus
    val noTiles = Multimodal.imageTiles(spark, noMedia, patch = 4,
      codec = new Multimodal.SniffRaster).toDF()
    assert(noTiles.count() == 0)
    assert(Multimodal.subimageIndex(noTiles).count() == 0)
    assert(Multimodal.subimageProbePrepped(
      Multimodal.subimageIndex(noTiles), noTiles).count() == 0)
    // MvFold: empty build reads empty; empty MV accepts a fold; a
    // live MV absorbs an empty delta unchanged (incl. the bitmap arm)
    val noFacts = Seq.empty[(String, Long, Long)].toDF("grp", "v", "member")
    val one = Seq(("a", 2L, 7L)).toDF("grp", "v", "member")
    val ks = Seq("grp")
    val ms = Seq(MvSum("s", col("v")), MvCount("n"),
      MvBitmapDistinct("d", col("member"), 1 << 10))
    assert(MvFold.read(MvFold.build(noFacts, ks, ms), ks, ms).count() == 0)
    assert(MvFold.read(MvFold.fold(MvFold.build(noFacts, ks, ms),
      one, ks, ms), ks, ms).count() == 1)
    val absorbed = MvFold.read(MvFold.fold(MvFold.build(one, ks, ms),
      noFacts, ks, ms), ks, ms).collect()
    assert(absorbed.length == 1 && absorbed.head.getLong(3) == 1L)
    // histogram-quantile arm: empty build reads empty quantiles; a
    // live histogram absorbs an empty delta unchanged; merge of an
    // empty partial frame is empty
    val (lo, hi, nb) = (0L, 64L, 64)
    val hEmpty = MvFold.buildHist(noFacts, ks, col("v"), lo, hi, nb)
    assert(MvFold.readHistQuantiles(hEmpty, ks, Seq(50), lo, hi, nb)
      .count() == 0)
    val hOne = MvFold.foldHist(MvFold.buildHist(one, ks, col("v"), lo, hi, nb),
      noFacts, ks, col("v"), lo, hi, nb)
    val q = MvFold.readHistQuantiles(hOne, ks, Seq(50, 100), lo, hi, nb)
      .collect()
    assert(q.length == 1 && q.head.getLong(1) == 2L && q.head.getLong(2) == 2L)
    assert(MvFold.merge(MvFold.build(noFacts, ks, Seq(MvCount("n"))),
      ks, Seq(MvCount("n"))).count() == 0)
  }

  test("round-19 operators handle empty inputs") {
    // tile quarantine: empty media → zero rows (strict grid likewise)
    val noMedia = Seq.empty[(Long, Array[Byte], String, Int, Int)]
      .toDF("doc_id", "payload", "media_type", "width", "height")
    assert(Multimodal.imageTilesQuarantine(spark, noMedia,
      codec = new Multimodal.SniffRaster).count() == 0)
    // hierarchy × attribute cube: empty facts → empty cube (the
    // labels join finds no aggregate rows)
    val adim = operators.HierarchyQueries.dimension(spark, sf).aggregationDim
    val noFacts2 = Seq.empty[(Long, String, Double, Double)]
      .toDF("leaf_key", "c_mktsegment", "sales_amount", "unit_quantity")
    assert(HierarchyAgg.hierSegmentCube(noFacts2, adim).count() == 0)
    // pair-grain rollup read-off: empty pair store → empty rollup
    val noPairs = Seq.empty[(Long, Long, Double, Double, Long)]
      .toDF("leaf_key", "customer_id", "mv_sales", "mv_qty", "mv_n")
    assert(HierarchyAgg.finalizeRollup(
      HierarchyAgg.rollupMvFromPairs(noPairs, adim), adim).count() == 0)
    // histogram merge at the public hist grain: empty partials → empty
    val noFacts3 = Seq.empty[(String, Long)].toDF("grp", "v")
    assert(MvFold.mergeHist(
      MvFold.buildHist(noFacts3, Seq("grp"), col("v"), 0L, 64L, 64),
      Seq("grp")).count() == 0)
  }
}
