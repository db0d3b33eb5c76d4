package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink helpers (SURVEY.md §4): uniform readers over the
  * formats Spark ships (parquet/csv/json/orc), plus the two write
  * layouts that matter at 100 TB:
  *
  * - **partitioned** writes (`partitionBy`): directory-level pruning —
  *   a filter on the partition column skips whole directories at plan
  *   time (`PartitionFilters` in explain).
  * - **bucketed** writes (`bucketBy` + `sortBy`): co-located,
  *   pre-sorted layout — equi-joins and aggregations on the bucket key
  *   run with NO shuffle (the single biggest cost at scale).
  */
object Sources {

  def read(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.options(options)
    format match {
      case "csv" => r.option("header", options.getOrElse("header", "true"))
        .option("inferSchema", options.getOrElse("inferSchema", "true")).csv(path)
      case "json" => r.json(path)
      case "orc" => r.orc(path)
      case _ => r.parquet(path)
    }
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    format match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "orc" => w.orc(path)
      case _ => w.parquet(path)
    }
  }

  /** Hive-style partitioned layout: one directory per value of
    * `partitionCols`. Keep partition-column cardinality bounded
    * (thousands, not millions) or the file listing dominates.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], format: String = "parquet"): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .format(format).save(path)

  /** Bucketed + sorted table: joins/aggregations on `bucketCol`
    * between tables with the same bucketing skip the shuffle AND the
    * sort (SortMergeJoin reads both sides pre-partitioned, pre-sorted).
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(tableName)
}
