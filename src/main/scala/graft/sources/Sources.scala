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

  /** SORTED layout: range-partition by `sortCol`, sort within each
    * file. Parquet stamps min/max stats per row group, so point/range
    * predicates on `sortCol` skip everything outside their value
    * range at READ time — on a random layout every row group's
    * [min,max] spans the whole domain and nothing skips. This is the
    * "sort your fact table by its filter column" rule: at 100 TB the
    * difference between scanning one row group and scanning the table.
    * (Hive partitioning prunes at directory granularity for LOW-
    * cardinality columns; sorting prunes at row-group granularity for
    * high-cardinality ones — they compose: partition by date, sort by
    * the secondary key.)
    */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
      numFiles: Int = 0): Unit = {
    val ranged = if (numFiles > 0)
      df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(sortCol))
    else df.repartitionByRange(org.apache.spark.sql.functions.col(sortCol))
    ranged.sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the steady-state maintenance job of any
    * long-lived 100 TB table (streaming sinks and per-batch appends
    * fragment a table until the file listing and per-file open costs
    * dominate scans). Rewrites `path` as ceil(bytes/targetFileBytes)
    * files via a size-estimated `repartition`, crash-safely: writes to
    * a sibling temp dir, renames the live dir aside, atomically moves
    * the temp dir into place, then deletes the old data. A crash
    * between the two renames leaves the table readable at
    * `path + ".__compact_old"` (never a missing/half-deleted live
    * path); a leftover `.__compact_old` from a previous crash is
    * cleared on the next run. Returns the new file count.
    *
    * The repartition is a round-robin shuffle of the table — that IS
    * the cost of compaction; run it per-partition-directory in
    * production so only fragmented partitions pay.
    */
  def compactParquet(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(path)
    val tmp = Paths.get(path + ".__compact_tmp")
    val old = Paths.get(path + ".__compact_old")
    def rmTree(p: java.nio.file.Path): Unit =
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    // Self-heal the crash window between the two ATOMIC_MOVEs below: if
    // a previous run died there, the live path is absent but a complete
    // copy exists — the compacted tmp (committed iff _SUCCESS was
    // written) or the renamed-aside old. Restore one atomically before
    // touching anything else, so recovery needs no manual step.
    if (!Files.exists(dir)) {
      if (Files.exists(tmp.resolve("_SUCCESS"))) {
        Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE) // finish the swap
      } else if (Files.exists(old)) {
        Files.move(old, dir, StandardCopyOption.ATOMIC_MOVE) // roll back
      } else {
        throw new java.nio.file.NoSuchFileException(path)
      }
    }
    val bytes = Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(Files.size).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    rmTree(old) // leftover from a previous crashed run
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: rename live aside, move temp into place, then delete old —
    // the live path is never absent for longer than the gap between the
    // two ATOMIC_MOVEs, and a crash anywhere leaves a complete copy at
    // either `path` or `old`
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    rmTree(old)
    nFiles
  }

  /** Z-ORDERED layout: Morton-interleave two numeric columns and
    * range-partition + sort on the z-value, so every output file
    * covers a small RECTANGLE of (colA, colB) space — parquet min/max
    * footer stats then prune scans filtered on EITHER column (the
    * multi-column generalization of [[writeSorted]], which prunes only
    * its own sort column; the idea behind Delta/Iceberg's OPTIMIZE
    * ZORDER). Columns are linearly min/max-scaled to `bits` bits from
    * one metadata-cheap aggregate; linear scaling is the right choice
    * for roughly uniform keys — heavily skewed keys would want
    * quantile scaling, which costs a sort and is out of scope here.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int = 0, bits: Int = 20): Unit = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val b = df.agg(
      min(col(colA)).cast("double").as("minA"), max(col(colA)).cast("double").as("maxA"),
      min(col(colB)).cast("double").as("minB"), max(col(colB)).cast("double").as("maxB"))
      .head()
    // empty input or an all-null key column yields null min/max; there
    // is no z-order to compute, so write the frame as-is (an empty or
    // single-extent layout is already "sorted") instead of NPE-ing on
    // getDouble
    if (b.anyNull) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (minA, maxA, minB, maxB) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val hi = (1L << bits) - 1
    def scaled(c: String, lo: Double, hiV: Double) =
      if (hiV <= lo) lit(0L)
      else least(lit(hi), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(hiV - lo) * hi).cast("long")))
    val z = df.withColumn("__z", graft.functions.InterleaveBitsExpr
      .interleaveBits(scaled(colA, minA, maxA), scaled(colB, minB, maxB)))
    val ranged = if (numFiles > 0)
      z.repartitionByRange(numFiles, col("__z"))
    else z.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
