package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]` in Spark 4, so library
  * extensions expose it from inside the package — the same pattern
  * Spark ecosystem libraries use to register custom expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Session-scoped SQL registration of a custom expression (for
    * cluster-wide registration prefer `GraftExtensions` via
    * `spark.sql.extensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  def analyzedPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def dataFrame(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Rebuild a materialized Dataset as a bare `LogicalRDD` with
    * DEFAULT statistics.
    *
    * `Dataset.localCheckpoint` truncates lineage but CARRIES OVER the
    * source plan's statistics into the checkpoint's `LogicalRDD`
    * (`originStats`). In an iterative algorithm whose round output
    * feeds the next round's joins, those estimates get multiplied
    * every round (Catalyst's size-only join estimate is
    * left × right), so the `sizeInBytes` BigInt's bit-length grows
    * geometrically and the driver ends up in million-bit
    * `BigInteger.multiply` calls during planning — rounds that take
    * 0.7s at first take minutes by round 12. Dropping the carried
    * stats resets the estimate to the session default each round.
    */
  def freshStats(df: Dataset[_]): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(spark,
      execution.LogicalRDD(df.queryExecution.analyzed.output,
        df.queryExecution.toRdd)(spark))
  }

  /** DataFrame over an InternalRow RDD with an explicit schema — the
    * return path for operators that drop to the internal-row level
    * (e.g. the single-task union-find in
    * [[graft.operators.Dedup.connectedComponents]]).
    */
  def dataFrameFromInternalRows(spark: SparkSession,
      schema: types.StructType,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow]): DataFrame = {
    val s = spark.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(s, execution.LogicalRDD(
      catalyst.types.DataTypeUtils.toAttributes(schema), rdd)(s))
  }
}
