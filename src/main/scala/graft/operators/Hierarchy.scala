package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parent-child hierarchy dimension engine.
  *
  * Re-expresses the reference's `HierarchyDimension`
  * (reference: classes/hierarchy_dimension_table.py:47-228) Spark-first.
  * The reference materialises three DuckDB tables via SQLAlchemy
  * recursive CTEs; Spark has no recursive CTE, so we derive the same
  * shapes with an iterative breadth-first frontier join — bounded by
  * hierarchy depth (`maxDepth`), each step a distributed hash join on
  * the (small) dimension. The ancestor–descendant closure then needs NO
  * recursion at all: each node's root-path is already an array column,
  * so the closure is a single `explode` — a narrow, shuffle-free pass.
  *
  * Scale: hierarchy dimensions are O(nodes), tiny next to facts. All
  * derivations happen on the dim side; fact-side queries broadcast the
  * result (see [[HierarchyAgg]]). The only global operation is the DFS
  * `node_sort_order` row_number, again dim-sized.
  *
  * @param nodes       parent-child node table; one row per node
  * @param nodeIdCol   primary-key column (reference: node_id)
  * @param parentIdCol self-referencing FK column; null ⇒ root
  * @param levelFields node attribute columns carried into the path
  *                    structs and flattened per level
  * @param levelColumns how many `level_{i}_*` column families to emit
  *                    (10, matching the reference's hardcoded width —
  *                    levels beyond the hierarchy depth are null)
  * @param maxDepth    safety bound on the BFS loop (cycles / bad data)
  * @param maxNodes    guard on the dimension size: every derivation
  *                    here is deliberately dim-sized (single-partition
  *                    DFS window, broadcast closure), which is correct
  *                    for hierarchies but would silently serialize a
  *                    fact-sized input through one task — fail fast
  *                    instead
  * @param knownDepth  exact hierarchy depth if the caller knows it
  *                    (> 0): the BFS loop then runs a fixed number of
  *                    joins with NO per-level `isEmpty` action — on a
  *                    cluster each avoided action is a full job launch
  */
class HierarchyDimension(
    nodes: DataFrame,
    nodeIdCol: String = "node_id",
    parentIdCol: String = "parent_node_id",
    levelFields: Seq[String] = Seq("node_id", "node_natural_key", "node_name", "level_name"),
    levelColumns: Int = 10,
    maxDepth: Int = 16,
    knownDepth: Int = -1,
    maxNodes: Long = 10_000_000L) {

  /** Nodes + `is_root` / `is_leaf` flags
    * (reference: classes/hierarchy_dimension_table.py:96-107).
    * `is_leaf` = node never appears as a parent — a left-anti–style
    * check done as a broadcast join against the distinct parent set.
    */
  lazy val flaggedNodes: DataFrame = {
    // hierarchy dims are small by definition (even with 100 TB facts);
    // collapsing to one partition makes the whole derivation — BFS
    // joins, window, closure explode — exchange-free narrow stages
    val n1 = nodes.coalesce(1)
    val parents = n1
      .filter(col(parentIdCol).isNotNull)
      .select(col(parentIdCol).as("__pid"))
      .distinct()
    n1
      .join(broadcast(parents), col(nodeIdCol) === col("__pid"), "left")
      .withColumn("is_root", col(parentIdCol).isNull)
      .withColumn("is_leaf", col("__pid").isNull)
      .drop("__pid")
  }

  private def pathStruct: Column = struct(levelFields.map(col): _*)

  /** Reporting dim + the root-path array column `path` (internal).
    * Cached: the closure derivation reads it twice (descendant explode
    * + ancestor attribute join).
    */
  lazy val reportingDimWithPath: DataFrame = {
    val flagged = flaggedNodes.cache()
    // materializes the cache AND enforces the dim-sized contract
    // before the single-partition window below can silently become
    // the bottleneck on a mistakenly fact-sized node table
    val n = flagged.count()
    require(n <= maxNodes,
      s"hierarchy node table has $n rows (> maxNodes=$maxNodes); " +
        "the reporting-dim derivation is designed for dimension-sized " +
        "inputs — raise maxNodes explicitly if this is intentional")
    var frontier = flagged
      .filter(col("is_root"))
      .withColumn("level_number", lit(1))
      .withColumn("path", array(pathStruct))
    var acc = frontier
    var depth = 1
    var done = false
    while (!done && depth < (if (knownDepth > 0) knownDepth else maxDepth)) {
      val parents = frontier.select(
        col(nodeIdCol).as("__parent_id"),
        col("level_number").as("__parent_level"),
        col("path").as("__parent_path"))
      frontier = flagged
        .join(parents, col(parentIdCol) === col("__parent_id"))
        .withColumn("level_number", col("__parent_level") + 1)
        .withColumn("path", array_append(col("__parent_path"), pathStruct))
        .drop("__parent_id", "__parent_level", "__parent_path")
      // with a known depth the loop is fixed-length — no isEmpty
      // action (each one is a whole Spark job) per level
      if (knownDepth <= 0 && frontier.isEmpty) done = true
      else { acc = acc.unionByName(frontier); depth += 1 }
    }
    // DFS ordering: row_number over the lexicographic root-path key,
    // stringifying each path struct as its JSON (reference:
    // hierarchy_dimension_table.py:136-144 orders by the stringified
    // node_json path — the JSON form also fixes the sibling tie-break:
    // the closing quote after a short node_id sorts before any longer
    // id sharing the prefix). Dim-sized single-partition window.
    // ignoreNullFields=false: DuckDB's to_json emits "field":null, Spark
    // by default omits the field — a null levelField would change both
    // the sort key and node_json vs the oracle/reference otherwise.
    val pathKey = array_join(
      expr("transform(path, x -> to_json(x, map('ignoreNullFields','false')))"), "/")
    acc.withColumn("node_sort_order",
      row_number().over(Window.orderBy(pathKey)).cast("long"))
      .cache()
  }

  /** Reporting dimension: `level_number`, DFS `node_sort_order`, the
    * per-node `node_json` struct-as-JSON column, and flattened
    * `level_{i}_<field>` columns
    * (reference: hierarchy_dimension_table.py:109-171).
    */
  lazy val reportingDim: DataFrame = {
    val withLevels = (1 to levelColumns).foldLeft(reportingDimWithPath) {
      case (df, i) =>
        levelFields.foldLeft(df) { case (d, f) =>
          // try_element_at: out-of-range → null (ANSI-safe)
          d.withColumn(s"level_${i}_$f",
            expr(s"try_element_at(path, $i).$f"))
        }
    }
    withLevels
      .withColumn("node_json",
        to_json(pathStruct, Map("ignoreNullFields" -> "false")))
      .drop("path")
  }

  /** Columns carried into the ancestor_ / descendant_ families —
    * everything except the parent pointer and the flattened levels
    * (reference: hierarchy_dimension_table.py:203-215 excludes
    * node_json, node_json_path, parent_node_id).
    */
  private lazy val familyCols: Seq[String] =
    (nodes.columns.filterNot(_ == parentIdCol) ++
      Seq("is_root", "is_leaf", "level_number", "node_sort_order")).toSeq

  /** Aggregation dimension: the ancestor–descendant closure, self-pairs
    * included, with `net_level`
    * (reference: hierarchy_dimension_table.py:173-228).
    *
    * Spark-first derivation: each node's `path` already lists all its
    * ancestors (self included), so the closure is `explode(path)` —
    * no second recursion as in the reference. Ancestor attributes are
    * recovered with a broadcast self-join on the reporting dim.
    */
  lazy val aggregationDim: DataFrame = {
    val rd = reportingDim
    val descendants = reportingDimWithPath
      .withColumn("__ancestor_id", explode(expr(s"transform(path, x -> x.$nodeIdCol)")))
      .select(col("__ancestor_id") +: familyCols.map(c => col(c).as(s"descendant_$c")): _*)
    val ancestors = rd.select(familyCols.map(c => col(c).as(s"ancestor_$c")): _*)
    descendants
      .join(broadcast(ancestors),
        col("__ancestor_id") === col(s"ancestor_$nodeIdCol"))
      .drop("__ancestor_id")
      .withColumn("net_level",
        col("descendant_level_number") - col("ancestor_level_number"))
  }
}
