package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{HierarchyAgg, HierarchyDimension}

/** 100M-NODE STRESS PROOF (SURVEY §2.H; r16-verdict growth task): the
  * claim "the distributed leveling fallback + the collect-free MV
  * repair survive a 100M-node dimension" as regression-guarded
  * executable facts instead of design-notes prose. No large data —
  * small synthetic deep/wide dims forced down the >maxNodes path,
  * with a job-start listener pinning the DRIVER-SIDE ACTION counts:
  * an accidental `.collect()`/eager probe sneaking into the leveling
  * loop or the repair's control path shows up as extra scheduled
  * jobs and fails the pin, long before anyone runs it at 100M nodes.
  */
class ScaleProofSpec extends SparkSpec {
  import spark.implicits._

  /** Runs `body` and returns (result, number of Spark jobs its
    * driver-side actions scheduled). Listener delivery is async, so
    * the count drains behind a short sleep — bounds asserted against
    * it carry documented slack.
    */
  private def countJobs[A](body: => A): (A, Int) = {
    val n = new AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(800) // drain the async listener bus
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** root → chain c1..c7 (depth exercise) + `wide` leaves under the
    * root (breadth exercise). Natural keys: root=1, chain ci=10+i,
    * wide wj=1000+j.
    */
  private def deepWideNodes(wide: Int): DataFrame = {
    val rows =
      Seq(("root", 1L, "Root", "L1", null: String)) ++
        (1 to 7).map(i => (s"c$i", 10L + i, s"Chain $i", s"L${i + 1}",
          if (i == 1) "root" else s"c${i - 1}")) ++
        (1 to wide).map(j => (s"w$j", 1000L + j, s"Wide $j", "L2", "root"))
    rows.toDF("node_id", "node_natural_key", "node_name", "level_name",
      "parent_node_id")
  }

  private def distDim(nodes: DataFrame): HierarchyDimension =
    new HierarchyDimension(nodes, maxNodes = 50L, knownDepth = 8)

  test("distributed leveling schedules O(depth) jobs — node count does not move the count") {
    // the BFS loop costs a bounded number of jobs PER LEVEL (frontier
    // checkpoint + emptiness probe) plus a constant tail (base
    // checkpoint, rank's range-partition sort + zipWithIndex offset
    // job, dropped-row anti-join) — NEVER a per-node or per-leaf
    // driver action. 4× the leaves must therefore schedule (about)
    // the same number of jobs; a per-node action would blow the
    // second pin by hundreds.
    val (_, jobsA) = countJobs {
      distDim(deepWideNodes(wide = 300)).reportingDim.count()
    }
    val (_, jobsB) = countJobs {
      distDim(deepWideNodes(wide = 1200)).reportingDim.count()
    }
    // depth 8 × ~3 jobs/level + ~12 constant-tail jobs, with slack
    // for AQE sub-jobs — the value of the pin is its ORDER, not the
    // exact constant
    assert(jobsA <= 50, s"leveling at 308 nodes scheduled $jobsA jobs")
    assert(jobsB <= 50, s"leveling at 1208 nodes scheduled $jobsB jobs")
    assert(math.abs(jobsB - jobsA) <= 6,
      s"job count moved with NODE COUNT ($jobsA -> $jobsB): a per-node " +
        "driver action crept into the distributed leveling path")
  }

  test("collect-free MV repair composes with the distributed dim: bounded control jobs, rebuild-identical") {
    val facts = ((1 to 300).map(j => (1000L + j, (j % 7).toLong, 1.0, j * 1.0)) :+
      ((17L, 3L, 2.0, 42.0))) // c7, the chain leaf
      .toDF("leaf_key", "customer_id", "unit_quantity", "sales_amount")
    val oldDim = distDim(deepWideNodes(wide = 300))
    // the reparent: w5 moves from under the root to under the chain
    // leaf c7 — the invalidated spine is c1..c7 (symmetric difference
    // of w5's old and new strict ancestors), the root keeps its rows
    val newDim = distDim(deepWideNodes(wide = 300)
      .withColumn("parent_node_id",
        when(col("node_id") === "w5", lit("c7"))
          .otherwise(col("parent_node_id"))))
    // pre-materialize both dims' derivations and pin the stored MV:
    // the job pin below must see ONLY the repair's own control
    // actions, not lazily-triggered dimension builds (a stored MV is
    // the realistic input — repairing a recomputed-per-consumer MV
    // plan would re-run the rollup once per control branch)
    oldDim.aggregationDim.count(); oldDim.closurePairs.count()
    oldDim.flaggedNodes.count()
    newDim.aggregationDim.count(); newDim.closurePairs.count()
    newDim.flaggedNodes.count()
    val mv = HierarchyAgg.rollupMv(facts, oldDim.aggregationDim)
      .localCheckpoint(true)
    val (repaired, ctorJobs) = countJobs {
      HierarchyAgg.repairRollupMv(mv, facts, oldDim, newDim)
    }
    // construction runs exactly the control path: the pinned tagged
    // control frame build + the 1-row isEmpty probe that keeps an
    // always-empty fact branch out of the plan (h16's design) — a
    // handful of dim-sized jobs, NEVER a leaf-grain collect (which
    // at 100M leaves is a driver OOM, and at any size schedules a
    // fact-sized job this pin would catch)
    assert(ctorJobs <= 10,
      s"repairRollupMv construction scheduled $ctorJobs jobs — the " +
        "collect-free control path runs ~2-4 (cache build + isEmpty probe)")
    // and the repair is result-identical to rebuilding the MV from
    // scratch under the new dimension — on the DISTRIBUTED-leveling
    // dims, proving the h16 composition end-to-end on the exact
    // engine path a 100M-node hierarchy would take
    def canon(df: DataFrame): Set[String] = {
      val cols = df.columns.sorted
      df.selectExpr(cols: _*).collect().map(_.toString).toSet
    }
    val repairedOut = HierarchyAgg.finalizeRollup(repaired, newDim.aggregationDim)
    val rebuilt = HierarchyAgg.finalizeRollup(
      HierarchyAgg.rollupMv(facts, newDim.aggregationDim), newDim.aggregationDim)
    assert(canon(repairedOut) == canon(rebuilt))
    // the moved leaf's new ancestors really carry its partials now
    // (product_node_name wears the reference's lpad level indent)
    val c1Row = repairedOut.filter(col("product_node_name").contains("Chain 1"))
    assert(c1Row.limit(1).count() === 1L)
  }

  test("zero-dim-rebuild move repair (h22 shape) composes with the distributed closure") {
    // the same reparent repaired WITHOUT building newDim at all:
    // invalidation + routing from the OLD distributed closure alone
    // (moveSubtreeClosure), recompute from the MV's own leaf
    // self-pair partials — equality against the full rebuild proves
    // the h21 ∘ h16 composition holds on the distributed-leveling
    // closure too
    val facts = ((1 to 300).map(j => (1000L + j, (j % 7).toLong, 1.0, j * 1.0)) :+
      ((17L, 3L, 2.0, 42.0)))
      .toDF("leaf_key", "customer_id", "unit_quantity", "sales_amount")
    val oldDim = distDim(deepWideNodes(wide = 300))
    val closure = oldDim.closurePairs
    val leaves = oldDim.flaggedNodes.filter(col("is_leaf"))
      .select(col("node_id").as("leaf_node_id"),
        col("node_natural_key").as("leaf_nk"))
    val leafAgg = facts.join(broadcast(leaves), col("leaf_key") === col("leaf_nk"))
      .groupBy("leaf_node_id")
      .agg(sum("sales_amount").as("sum_raw"),
        count(lit(1)).as("count_of_fact_records"))
    def idMv(cl: DataFrame): DataFrame =
      leafAgg.join(broadcast(cl), col("leaf_node_id") === col("descendant_node_id"))
        .groupBy("ancestor_node_id")
        .agg(sum("sum_raw").as("sum_raw"),
          sum("count_of_fact_records").as("count_of_fact_records"))
    val repaired = HierarchyAgg.moveMvRepair(idMv(closure), closure, "w5", "c7")
    val movedClosure = HierarchyDimension.moveSubtreeClosure(closure, "w5", "c7")
    def canon(df: DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(canon(repaired) == canon(idMv(movedClosure)))
  }
}
