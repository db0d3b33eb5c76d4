package graft

/** Dev tool: dump formatted physical plans of the scale-critical
  * queries for audit (SURVEY.md §7 step 7).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq("h4_hier_agg", "q3_join_agg", "d4_ngram_jaccard",
      "d5_embedding_neardup", "s1_knn_brute", "st2_sessionize", "q21_asof_join",
      "d1_exact_dedup", "q17_time_agg")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(4000))
    }
    spark.stop()
  }
}
