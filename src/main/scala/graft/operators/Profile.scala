package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Table profiling — the data-QA sweep every training-data pipeline
  * runs before ingestion: per column, null count, distinct count, and
  * min/max (stringified for a uniform schema).
  *
  * Two distinct-count modes:
  * - approx (default): ALL per-column aggregates — including
  *   `approx_count_distinct` (HLL++, mergeable sketch) — run in ONE
  *   aggregation job over one table scan. No Expand, no extra shuffle:
  *   the right default at 100 TB, where exactness is not a profiling
  *   requirement.
  * - exact (`exactDistinct = true`): one aggregation job per column,
  *   each with a single `countDistinct` (Spark plans a lone distinct
  *   as a two-phase hash aggregate with NO Expand; five distincts in
  *   one aggregate would Expand the scan 6×, the round-1 q22 cost).
  *   Each job's parquet scan prunes to just its column, so the five
  *   jobs together read less than one full-width scan.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    if (exactDistinct) {
      cols.map { c =>
        df.agg(
            count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_value"),
            max(col(c)).cast("string").as("max_value"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_.unionAll(_))
    } else {
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
          approx_count_distinct(col(c)).as(s"__distinct_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"),
          count(lit(1)).as(s"__count_$c"))
      }
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val rows = cols.map { c =>
        struct(
          lit(c).as("column_name"),
          col(s"__count_$c").as("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__distinct_$c").as("n_distinct"),
          col(s"__min_$c").as("min_value"),
          col(s"__max_$c").as("max_value"))
      }
      wide.select(explode(array(rows: _*)).as("p")).select("p.*")
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // registry keeps the exact mode — countDistinct matches DuckDB's
    // COUNT(DISTINCT) bit-for-bit, so the oracle stays a hash check
    "q22_profile" -> ((s, d) =>
      profile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
        exactDistinct = true))
  )

  private def colSql(c: String) = s"""
    SELECT '$c' AS column_name, COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      COUNT(DISTINCT $c) AS n_distinct,
      CAST(MIN($c) AS VARCHAR) AS min_value, CAST(MAX($c) AS VARCHAR) AS max_value
    FROM orders"""

  val oracles: Map[String, String] = Map(
    "q22_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .map(colSql).mkString(" UNION ALL ")
  )
}
