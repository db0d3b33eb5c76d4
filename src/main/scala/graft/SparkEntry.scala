package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline result (main.py:27-69): hierarchical
    * rollup of sales facts over the region→nation dimension closure.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("h4_hier_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    HierarchyQueries.queries ++ OlapQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      MultimodalQueries.queries ++ graft.streaming.StreamingQueries.queries ++
      Profile.queries ++ Packing.queries ++ RetrievalQueries.queries ++
      GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    HierarchyQueries.oracles ++ OlapQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ graft.streaming.StreamingQueries.oracles ++
      Profile.oracles ++ Packing.oracles ++ RetrievalQueries.oracles ++
      GraphQueries.oracles
}
