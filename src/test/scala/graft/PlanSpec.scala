package graft

import graft.operators.{HierarchyQueries, OlapQueries}

/** 100 TB plan audits (SURVEY.md §5): assert the physical plans have
  * the scale-critical shapes — pushdown reaching the scan, broadcasts
  * on dim joins, partial aggregation, top-k without a global sort.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  test("q2: filters and projection are pushed to the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual("), p)
    // column pruning: read schema restricted to referenced columns
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_orderkey,l_partkey,l_suppkey,l_linenumber,l_quantity,l_extendedprice,l_discount,l_tax,l_returnflag,l_linestatus,l_shipdate"),
      "scan reads all columns — pruning failed")
  }

  test("q4: dim chain joins are broadcast, fact side does not shuffle for the join") {
    val p = plan("q4_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("h4 flagship: closure dim is broadcast; aggregation is partial (map-side combine)") {
    val p = plan("h4_hier_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    // partial + final HashAggregate pair
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q5: top-k plans as TakeOrderedAndProject (no global sort shuffle)") {
    val p = plan("q5_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("multimodal: metadata-only query never reads the payload source column") {
    val media = graft.operators.Multimodal.mediaTable(Tables.documents(spark, sf))
    val metaOnly = media.select("doc_id", "media_type", "width", "height")
    val p = metaOnly.queryExecution.executedPlan.toString()
    // payload = encode(text); a pruned plan reads doc_id only
    assert(!p.contains("ReadSchema: struct<doc_id:bigint,text"), p)
  }

  test("q1: aggregation runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    // AQE's pre-execution plan string hides codegen stages; ask for
    // the codegen explain explicitly
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen"), codegen.take(2000))
    assert(plan("q1_agg").contains("HashAggregate"))
  }
}
