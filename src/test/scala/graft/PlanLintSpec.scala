package graft

/** Engine-wide plan lint: every registry query's physical plan must be
  * free of the scale-killing operators — an accidental cartesian
  * product or an unintended nested-loop join anywhere in the registry
  * is a 100 TB outage, whatever the small-scale result looks like.
  *
  * Streaming entries (`st3`+) execute eagerly and return a memory-sink
  * table, so they are linted by their batch twins (st1/st2/st6/st7
  * register the equivalent plans) and skipped here.
  */
class PlanLintSpec extends SparkSpec {

  // Broadcast nested-loop joins that are DELIBERATE — each broadcasts
  // a provably tiny side, so the per-fact-row work is O(broadcast):
  private val nestedLoopAllowed = Set(
    "q30_band_join",       // 4-row literal band dim, non-equi predicate
    "q14_subquery",        // scalar subquery (1-row broadcast)
    "p3_mixture_plan",     // 1-row corpus-total broadcast
    "p17_decontaminated_mixture", // p3's 1-row total broadcast, post-decontam
    "t9_unigram_logprob",  // 1-row corpus-total broadcast
    "t13_bigram_logprob",  // 1-row vocab-size broadcast
    "t14_perplexity_filter", // t13's vocab broadcast + 1-row stats broadcast
    "s1_knn_brute",        // brute-force baseline broadcasts the query set
    "s5_mips",             // exact MIPS broadcasts the query set (s1's shape)
    "s3_knn_ivf",          // broadcast k-means codebook (nlist rows)
    "s8_knn_ivfpq",        // broadcast coarse codebook for probe selection (s3's shape)
    "d13_semantic_dedup",  // broadcast k-means codebook (k rows)
    "h5_hier_agg_deep",    // dim construction: nation × 5-row segment literal
    "t11_tfidf",           // 1-row corpus-size broadcast
    "s4_range_search",     // range search broadcasts the query set (s1's shape)
    "s6_mips_lsh",         // 1-row max-norm broadcast (augmentation scale)
    "p7_temperature_mixture", // 1-row corpus-total broadcast (weight normalizer)
    "t18_bm25_topk",       // 1-row corpus-stats broadcast (N, avgdl)
    "s10_hybrid_rrf",      // t18's stats broadcast + s1's query-set broadcast
    "h21_closure_move",    // path-sized × subtree-sized closure-delta crosses
    "h22_move_mv_repair",  // h21's closure-delta crosses inside the repair
    "q46_market_basket",   // 1-row order-total broadcast (lift normalizer)
    "s11_pq_upsert",       // s8's coarse-codebook broadcast on the grown index
    "s22_pq_delete",       // s8's coarse-codebook broadcast on the pruned index
    "q50_rfm",             // 1-row anchor + three 1-row quintile-cut broadcasts
    "s12_knn_classify",    // brute-force baseline broadcasts the query set (s1)
    "s13_knn_graph",       // 9-row entry-point literal crossed onto the 10-row query set
    "q62_skyline",         // 1-row x-range broadcast (bucket scaling) + 256-row bucket stats
    "s15_recall_eval",     // composes s1's query-set broadcast (eval harness)
    "t22_collocations",    // two 1-row corpus-total broadcasts (t9's shape)
    "q64_abc_pareto",      // 1-row revenue-total broadcast (pct normalizer)
    "d22_lsh_recall_eval", // three 1-row metric frames crossed (eval readout)
    "d25_threshold_sweep", // d22's shape: three 1-row metric frames crossed per threshold
    "g9_modularity",       // 1-row edge-count broadcast (modularity normalizer)
    "s16_mmr_diversify",   // brute shortlist broadcasts the query set (s1)
    "q70_skew_profile",    // per-key 1-row stats ⨝ 1-row percentiles on a
                           // literal group key (constant-folded to NLJ)
    "q71_decile_lift",     // 1-row revenue-total broadcast (share normalizer)
    "q78_decile_transition", // globalNtile's 1-row entity-count broadcast (×2 years)
    "q74_aging_buckets",   // 1-row snapshot-date broadcast (q50's anchor)
    "s17_knn_regression",  // brute-force scan broadcasts the query set (s12)
    "s18_centroid_classify", // |labels|-row centroid frame crossed onto queries
    "q79_weekday_profile", // 1-row overall-average broadcast (q46's shape)
    "t26_token_burstiness", // 1-row corpus-size broadcast (t11's shape)
    "s19_recall_curve",    // d25's shape: two 1-row metric frames crossed
                           // per cutoff, over s1's query-set broadcast
    "t29_qlm_topk",        // 1-row corpus-token-total broadcast (t18's shape)
    "s21_sq8_recall",      // 1-row (lo,hi)-array broadcast + s1's query-set broadcast
    "s20_ivf_probe_curve"  // s3's codebook broadcast + s1's query-set
                           // broadcast + two 1-row metric frames crossed
                           // per sweep point (s19's shape on the probe axis)
  )

  private val skipEager = Set(
    "st3_windowed_agg_stream", "st4_session_window_stream",
    "st5_stream_dedup", "st6_stream_static_join", "st7_stream_stream_join",
    "st24_stream_left_join",
    "st8_sliding_window_stream",
    // st9 materializes facts + runs the stream on invocation; its MV
    // merge plan is h9's (linted there)
    "st9_incremental_rollup_stream",
    // st23 likewise; its bitmap-MV fold plan is h24's (linted there)
    "st23_stream_distinct_mv",
    // st11 runs the stream + durable sink on invocation; its
    // classification plan is d11's (linted there)
    "st11_stream_neardup_sink",
    // st34 drives the stream on invocation; its probe plan is d8's
    // gram join (linted there)
    "st34_stream_decontam",
    // st35 drives the stream on invocation; its probe plan is m19's
    // tile-hash equi-join (linted there)
    "st35_stream_subimage",
    // st36 drives the stream on invocation; its decode plan is m20's
    // per-row permissive map (linted there)
    "st36_stream_quarantine",
    // st37 drives the stream on invocation; its fold plan is q81's
    // MvFold hash-aggregate (linted there)
    "st37_stream_mv_fold",
    // st38 runs the stream + durable MV store on invocation; its
    // partial/merge plans are q81's MvFold aggregates (linted there)
    "st38_stream_mv_sink",
    // st39 drives the stream on invocation; per-doc signal plan is
    // t28's, the fold plans are q81's MvFold aggregates (linted there)
    "st39_stream_datasheet",
    // st12/st13 drive the full stream on invocation; the histogram agg
    // plan is q39's (linted there); st14's session agg is st4's
    "st12_stream_histogram", "st13_stream_histogram_append",
    "st14_session_window_append",
    // st15 drives the stream on invocation; its top-k agg is q37's
    // bounded heap (linted there)
    "st15_windowed_topk",
    // st16 runs the stream + durable sink on invocation; its agg plan
    // is st13's (q39's histogram, linted there)
    "st16_stream_histogram_sink",
    // st19 drives the stream on invocation; its frequent-items agg
    // plan is q42's (linted there)
    "st19_stream_heavy_hitters",
    // st22 drives the stream on invocation; its bitmap agg plan is
    // q51's (linted there)
    "st22_stream_distinct",
    // st29 likewise; its KMV agg plan is h12's (linted there)
    "st29_stream_approx_distinct",
    // st30 likewise; its conditional-KMV agg shape is q63's
    "st30_stream_sketch_setops",
    // st20/st21 are the custom-state (fMGWS) paths, executed eagerly
    // like st17; their batch twins q44/q34 are linted above
    "st20_stream_attribution", "st21_stream_scd2",
    // st27/st28 drive the full watermarked stream on invocation;
    // their EWMA/Holt fold plans are q54's/q61's (linted there)
    "st27_stream_chart_pipeline", "st28_stream_holt_pipeline",
    // st31 likewise; its moment-sum agg shape is q66's (linted there)
    "st31_stream_corr",
    // st33 likewise; its digit-count agg shape is q69's (linted there)
    "st33_stream_benford",
    // st32 is a custom-state (fMGWS) path like st17/st20/st21
    "st32_stream_quota")

  // Unpartitioned windows that are DELIBERATE — each runs over a
  // provably domain-bounded frame (a grouped/aggregated result whose
  // cardinality is fixed by a dimension or bucket count, never by the
  // fact count), so the single-partition sort is O(domain):
  private val unpartitionedWindowAllowed: Set[String] = Set(
    "d24_cluster_profile",   // doc-share over the |distinct cluster sizes| histogram
    "h17_contribution",      // grand-total share over the node-grain rollup (dim-sized)
    "q56_rolling_distinct",  // 7d/cumulative frames over the DAY-grain frame (calendar-bounded)
    "q62_skyline",           // rank/cume frames over 256-row bucket stats + 1-row range frames
    // q64/q71/q78 (r22): the entity-grain global rank/cumsum/ntile
    // now runs through Olap.rangedGlobal's two-pass range-partitioned
    // decomposition — the only unpartitioned window left is the
    // per-partition OFFSET roll-up over the partition-COUNT-grain
    // stats frame (≤ defaultParallelism rows, bounded by cluster
    // size, never by data):
    "q64_abc_pareto",
    "q71_decile_lift",
    "q78_decile_transition",
    "q67_chi2_independence", // expected-count frames over the contingency cells (|seg|×|prio|)
    "q69_benford",           // digit-share frame over the 9 leading digits
    "q70_skew_profile",      // stat + percentile frames over per-key aggregates on literal key names
    "q83_seasonal_decompose") // centered 7-day trend over the DAY-grain
                              // aggregate (calendar-bounded, q56's shape)

  test("every unpartitioned window in a registry plan is limit-bounded or whitelisted domain-bounded") {
    import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // the global top-k idiom (filter rank <= k over an ORDER BY-only
    // window) is scale-safe: the optimizer pushes the limit below the
    // window, so the single-partition sort sees at most k rows —
    // recognize it by a bounding operator on the window's DIRECT
    // input chain. The walk descends only through unary row-preserving
    // or row-shrinking nodes (project/filter/sort/exchange/aggregate —
    // cardinality can't grow through them, so a limit below still
    // bounds the window input) and STOPS at multi-child nodes (a limit
    // inside one join/union input does NOT bound the join output) and
    // at generators (explode can expand a bounded input arbitrarily) —
    // the full-subtree collectFirst this replaces would have credited
    // a GlobalLimit buried in one side of an upstream join (ADVICE r16).
    def limitBounded(w: WindowExec): Boolean = {
      import org.apache.spark.sql.execution.{FilterExec, InputAdapter,
        LocalLimitExec, ProjectExec, SortExec, WholeStageCodegenExec}
      import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
      import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
        ObjectHashAggregateExec, SortAggregateExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      // WHITELIST of traversable unary nodes (ADVICE r17): descending
      // through ANY unary node would credit a limit below a unary
      // row-GROWING operator (ExpandExec from rollup/grouping sets,
      // object map nodes) — only nodes that provably preserve or
      // shrink cardinality may sit between the bounding operator and
      // the window. WindowExec itself is row-preserving (adds columns,
      // never rows: p15's global window sits above a partitioned
      // rank window whose WindowGroupLimit provides the bound).
      // Anything else (including GenerateExec and ExpandExec, which
      // fall through to the default) stops the walk.
      @annotation.tailrec
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case _: TakeOrderedAndProjectExec => true
        case _: WindowGroupLimitExec => true
        case _: GlobalLimitExec => true
        case u @ (_: ProjectExec | _: FilterExec | _: SortExec |
                  _: LocalLimitExec | _: WholeStageCodegenExec |
                  _: InputAdapter | _: ShuffleExchangeLike |
                  _: AQEShuffleReadExec | _: HashAggregateExec |
                  _: ObjectHashAggregateExec | _: SortAggregateExec |
                  _: WindowExec) =>
          walk(u.children.head)
        case _ => false
      }
      walk(w.child)
    }
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skipEager)
      .filterNot(unpartitionedWindowAllowed)
      .flatMap { name =>
        val pp: SparkPlan =
          SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.inputPlan
            case p => p
          }
        val unbounded = pp.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !limitBounded(w) => w
        }.size
        if (unbounded > 0)
          Some(s"$name: $unbounded unbounded unpartitioned Window(s)")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no registry query plans a cartesian product or stray nested-loop join") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skipEager)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString()
        val cartesian = p.contains("CartesianProduct")
        val stray = p.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopAllowed(name)
        if (cartesian || stray)
          Some(s"$name: cartesian=$cartesian strayNLJ=$stray")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
