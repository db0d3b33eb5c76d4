package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Table profiling — the data-QA sweep every training-data pipeline
  * runs before ingestion: per column, null count, exact distinct, and
  * min/max (stringified for a uniform schema).
  *
  * One pass per profile: all per-column aggregates run in a SINGLE
  * aggregation job (no per-column scans) — at 100 TB the table is read
  * once. The long (column, metric) shape comes from unpivoting the
  * one-row wide aggregate, which is free.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_profile" -> ((s, d) =>
      profile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")))
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
