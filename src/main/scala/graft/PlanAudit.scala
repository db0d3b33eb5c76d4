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
      "d1_exact_dedup", "q17_time_agg",
      // round-3 additions worth auditing
      "q30_band_join", "q31_funnel", "q32_retention", "q33_salted_join",
      "d7_incremental_dedup", "d8_decontaminate", "t9_unigram_logprob",
      "h7_hierarchy_diff", "h8_hier_agg_approx",
      // round-5 additions worth auditing
      "h10_multi_hier_agg", "t12_doc_chunks", "s4_range_search",
      "p4_split_shards",
      // round-9 additions worth auditing
      "h15_multi_hier_exact", "h16_targeted_mv_repair", "d9_source_overlap",
      "q16_percentile", "t8_repetition",
      // round-10 additions worth auditing
      "h14_history_rollup", "p6_token_budget_sample", "h17_contribution",
      "p7_temperature_mixture")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(4000))
    }
    spark.stop()
  }
}
