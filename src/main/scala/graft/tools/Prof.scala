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

    // --- dedup d6/d10 ---
    time("d6 cold") {
      DedupQueries.queries("d6_dup_clusters")(spark, sfDir).queryExecution.toRdd.count()
    }
    time("d10 cold") {
      DedupQueries.queries("d10_canonical_docs")(spark, sfDir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
