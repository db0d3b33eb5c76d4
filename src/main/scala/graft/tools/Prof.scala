package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch profiler for round-7 perf work (not part of the library). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def time(label: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"PROF $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get() - j0}")
    }
    // warm JVM/codegen at smallest sf, like Bench
    import graft.operators._
    time("warm h4@sf0.001") {
      HierarchyQueries.queries("h4_hier_agg")(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }
    time("warm h10@sf0.001") {
      HierarchyQueries.queries("h10_multi_hier_agg")(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }
    time("warm d10@sf0.001") {
      DedupQueries.queries("d10_canonical_docs")(spark, "/root/testdata/sf0.001")
        .queryExecution.toRdd.count()
    }

    // --- part dim derivation decomposition (cold at sfDir) ---
    val pd = new HierarchyDimension(HierarchyAgg.partNodes(spark, sfDir), knownDepth = 3)
    time("part flaggedNodes.count")   { pd.flaggedNodes.queryExecution.toRdd.count() }
    time("part reportingDimWithPath") { pd.reportingDimWithPath.queryExecution.toRdd.count() }
    time("part aggregationDim")       { pd.aggregationDim.queryExecution.toRdd.count() }
    time("part aggregationDim again") { pd.aggregationDim.queryExecution.toRdd.count() }

    val dd = new HierarchyDimension(HierarchyAgg.regionNationSegmentNodes(spark, sfDir), knownDepth = 4)
    time("deep flaggedNodes.count")   { dd.flaggedNodes.queryExecution.toRdd.count() }
    time("deep reportingDimWithPath") { dd.reportingDimWithPath.queryExecution.toRdd.count() }
    time("deep aggregationDim")       { dd.aggregationDim.queryExecution.toRdd.count() }

    // --- query end-to-end (uses session dimCache: first = cold) ---
    time("h10 cold") {
      HierarchyQueries.queries("h10_multi_hier_agg")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h10 warm") {
      HierarchyQueries.queries("h10_multi_hier_agg")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h6 warm-dim") {
      HierarchyQueries.queries("h6_hier_agg_parts")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h5 cold") {
      HierarchyQueries.queries("h5_hier_agg_deep")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h5 warm") {
      HierarchyQueries.queries("h5_hier_agg_deep")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h4 cold") {
      HierarchyQueries.queries("h4_hier_agg")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h11 cold") {
      HierarchyQueries.queries("h11_ragged_rollup")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("h7 cold") {
      HierarchyQueries.queries("h7_hierarchy_diff")(spark, sfDir).queryExecution.toRdd.count()
    }

    // --- dedup d6/d10 decomposition ---
    val docs = graft.Tables.documents(spark, sfDir)
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      val t0 = docs
        .withColumn("shingles", array_distinct(wordNgrams(tokens(lower(col("text"))), 2)))
        .withColumn("band", floor(col("n_chars") / 4))
        .select("doc_id", "lang", "n_chars", "band", "shingles")
      time("d6x shingle only") { t0.queryExecution.toRdd.count() }
      val t = t0.cache()
      time("d6x shingle cache build") { t.count() }
      val probes = t.withColumn("jband",
        explode(array(col("band") - 1, col("band"), col("band") + 1)))
      val cand = probes.as("a").join(t.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.jband") === col("b.band") &&
          abs(col("a.n_chars") - col("b.n_chars")) <= 3 &&
          col("a.doc_id") < col("b.doc_id"))
      time("d6x candidates only") {
        cand.select(col("a.doc_id"), col("b.doc_id")).queryExecution.toRdd.count()
      }
      time("d6x candidates + jaccard") {
        cand.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
            size(array_union(col("a.shingles"), col("b.shingles"))), 6).as("jaccard"))
          .queryExecution.toRdd.count()
      }
      time("d6x + threshold filter") {
        cand.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(size(array_intersect(col("a.shingles"), col("b.shingles"))).cast("double") /
            size(array_union(col("a.shingles"), col("b.shingles"))), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.05)
          .queryExecution.toRdd.count()
      }
      time("d6x ngramJaccard bare") {
        Dedup.ngramJaccard(docs).queryExecution.toRdd.count()
      }
    }
    time("d6a shingle+block+verify edges") {
      Dedup.ngramJaccard(docs).filter(org.apache.spark.sql.functions.col("jaccard") >= 0.05)
        .queryExecution.toRdd.count()
    }
    time("d6b edges again (no cache)") {
      Dedup.ngramJaccard(docs).filter(org.apache.spark.sql.functions.col("jaccard") >= 0.05)
        .queryExecution.toRdd.count()
    }
    time("d6c jaccardClusters full") {
      Dedup.jaccardClusters(docs, minJaccard = 0.05).queryExecution.toRdd.count()
    }
    time("d6 cold (registry, builds cache)") {
      DedupQueries.queries("d6_dup_clusters")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("d10 cold (reuses cache)") {
      DedupQueries.queries("d10_canonical_docs")(spark, sfDir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
