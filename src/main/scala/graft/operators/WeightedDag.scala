package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WEIGHTED-DAG AGGREGATION — the hierarchy engine generalized to
  * multi-parent dimensions with fractional edge weights (financial
  * consolidations, matrix organizations, ownership structures: a
  * subsidiary 70%-owned by one parent and 30% by another must split
  * its revenue 70/30 up both reporting lines). The tree engine's
  * closure ([[Hierarchy]]) cannot express this: a DAG node has
  * MULTIPLE ancestor paths and each contributes the PRODUCT of its
  * edge weights, summed over paths.
  *
  * Closure derivation is the leveling loop's shape: a frontier of
  * exactly-k-edge paths joins the edge list per iteration (all
  * dim-sized — the fact table is never in the loop), accumulating
  * Σ_paths Π_edges w. The driver-side `count()` per iteration is the
  * same dim-bounded control read every iterative closure pays
  * (reference: hierarchy_dimension_table.py:173-228 derives the tree
  * closure; the weight algebra is the DAG generalization). A DAG
  * deeper than `maxDepth` fails loudly — the cycle guard.
  *
  * CONSERVATION: when every node's out-weights sum to 1, each fact
  * row contributes exactly its full value to every ancestor LEVEL it
  * reaches — the root total equals the unweighted grand total
  * (spec-asserted). That invariant is what makes fractional rollups
  * auditable.
  */
object WeightedDag {

  /** Σ-over-paths Π-edge-weight ancestor closure of a weighted DAG.
    * `edges`: (child, parent, w) string keys + double weight. Output:
    * (node, anc, w) including the self pair at weight 1.
    */
  def weightedClosure(edges: DataFrame, maxDepth: Int = 10): DataFrame = {
    val nodes = edges.select(col("child").as("node"))
      .unionByName(edges.select(col("parent").as("node")))
      .distinct()
    val self = nodes.select(col("node"), col("node").as("anc"),
      lit(1.0).as("w"))
    var acc = self
    var frontier = self
    var d = 0
    var done = false
    while (d < maxDepth && !done) {
      // disambiguate by renaming, not aliases — the frontier derives
      // from the edge frame, so dotted aliases can collide
      val next = frontier
        .select(col("node"), col("anc").as("__hop"), col("w").as("__fw"))
        .join(edges.select(col("child").as("__hop"), col("parent"),
          col("w").as("__ew")), Seq("__hop"))
        .select(col("node"), col("parent").as("anc"),
          (col("__fw") * col("__ew")).as("w"))
        .localCheckpoint() // truncate the lineage per iteration
      if (next.isEmpty) done = true
      else { acc = acc.unionByName(next); frontier = next; d += 1 }
    }
    require(done,
      s"DAG has paths longer than maxDepth=$maxDepth — cycle or mis-sized bound")
    acc.groupBy("node", "anc").agg(sum("w").as("w"))
  }

  /** Fractional rollup: every ancestor's weighted total. Facts join
    * the broadcast closure on their leaf node (the fact side never
    * shuffles for the join — the h4 discipline), aggregate once at
    * ancestor grain.
    */
  def weightedRollup(facts: DataFrame, closure: DataFrame,
      nodeCol: String = "node", salesCol: String = "sales"): DataFrame =
    facts
      .join(broadcast(closure), Seq(nodeCol))
      .groupBy("anc")
      .agg(round(sum(col(salesCol) * col("w")), 2).as("weighted_sales"))
      .select(col("anc").as("node_id"), col("weighted_sales"))

  /** The registry fixture: the region→nation tree with a synthetic
    * DAG twist — every odd nation reports 70% to its own region and
    * 30% to the next region; even nations stay single-parent. Same
    * star-schema inputs as the h-family.
    */
  def demoEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val region = graft.Tables.region(spark, sfDir)
    val nation = graft.Tables.nation(spark, sfDir)
    val rEdges = region.select(
      concat(lit("r"), col("r_regionkey")).as("child"),
      lit("root").as("parent"), lit(1.0).as("w"))
    val primary = nation.select(
      concat(lit("n"), col("n_nationkey")).as("child"),
      concat(lit("r"), col("n_regionkey")).as("parent"),
      when(col("n_nationkey") % 2 === 1, 0.7).otherwise(1.0).as("w"))
    val secondary = nation.filter(col("n_nationkey") % 2 === 1).select(
      concat(lit("n"), col("n_nationkey")).as("child"),
      concat(lit("r"), (col("n_regionkey") + 1) % 5).as("parent"),
      lit(0.3).as("w"))
    rEdges.unionByName(primary).unionByName(secondary)
  }

  /** h25's query body: weighted closure over the demo DAG, fractional
    * rollup of customer-nation sales. */
  def demoRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val closure = weightedClosure(demoEdges(spark, sfDir), maxDepth = 4)
    val facts = HierarchyAgg.salesFacts(spark, sfDir)
      .select(concat(lit("n"), col("c_nationkey")).as("node"),
        col("sales_amount").as("sales"))
    weightedRollup(facts, closure)
  }
}
