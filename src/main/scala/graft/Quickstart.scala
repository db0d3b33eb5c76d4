package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-contained runnable demo — the library twin of the reference's
  * grocery-store walkthrough (reference:
  * sql/create_grocery_store_database.sql:1-135, create_database.py,
  * main.py:20-69): a 3-level product hierarchy
  * (All Products → Produce/Candy → four UPC leaves), a handful of
  * named-customer sales facts, and the flagship hierarchical rollup
  * over them. No testdata needed — everything is built in-memory, so
  * `sbt "runMain graft.Quickstart"` is a working first contact with
  * the API:
  *
  * {{{
  * val dim    = Graft.hierarchy(Quickstart.groceryNodes(spark))
  * val rollup = Graft.hierarchicalRollup(Quickstart.grocerySales(spark), dim)
  * }}}
  */
object Quickstart {

  /** The reference demo's product hierarchy: node_natural_key 0 = root,
    * 10/20 = categories, 1xx/2xx = UPC leaves.
    */
  def groceryNodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("p0", 0L, "All Products", "Total Products", null: String),
      ("p10", 10L, "Produce", "Category", "p0"),
      ("p101", 101L, "Spinach", "UPC", "p10"),
      ("p102", 102L, "Tomatoes", "UPC", "p10"),
      ("p20", 20L, "Candy", "Category", "p0"),
      ("p201", 201L, "Hershey Bar", "UPC", "p20"),
      ("p202", 202L, "Nerds", "UPC", "p20")
    ).toDF("node_id", "node_natural_key", "node_name", "level_name", "parent_node_id")
  }

  /** The reference demo's sales facts, keyed by UPC natural key. */
  def grocerySales(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (201L, "Phil", "2022-01-01", 1.0, 3.00),
      (201L, "Lottie", "2022-01-02", 5.0, 15.00),
      (202L, "Kalie", "2022-01-02", 2.0, 5.00),
      (102L, "Phil", "2022-01-02", 2.0, 2.00),
      (101L, "Popeye", "2022-01-03", 10.0, 5.00),
      (101L, "Brutus", "2022-01-04", 1.0, 0.50),
      (101L, "Lottie", "2022-01-04", 2.0, 1.00)
    ).toDF("leaf_key", "customer_id", "date_id", "unit_quantity", "sales_amount")
  }

  def rollup(spark: SparkSession): DataFrame =
    Graft.hierarchicalRollup(grocerySales(spark),
      Graft.hierarchy(groceryNodes(spark), knownDepth = 3))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Graft.install(spark)
    rollup(spark).show(truncate = false)
    spark.stop()
  }
}
