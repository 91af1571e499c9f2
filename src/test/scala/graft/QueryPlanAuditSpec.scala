package graft

/** Whole-contract plan audit: no driver query may plan an UNINTENDED
  * cartesian product or non-broadcast nested-loop join — the two shapes
  * that stop scaling outright (O(L×R) pair materialization / per-row
  * re-scan). Intentional exceptions are pinned by name with the reason
  * in a comment; a new query that accidentally plans one fails here
  * before it ever reaches the bench.
  */
class QueryPlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Queries whose plan legitimately contains a broadcast nested-loop:
  // every one crosses against a BROADCAST side that is structurally tiny
  // (a literal/aggregated singleton or a fixed centroid table), so the
  // "loop" is a map-side constant lookup, not a pair-space scan.
  private val broadcastLoopOk: Set[String] = Set(
    "x_ann_topk",      // query-vector singleton × corpus (broadcast)
    "x_hard_negatives", // 20 broadcast query vectors × corpus, label residual
    "x_ann_topk_agg",  // same shape, typed aggregator variant
    "x_ann_lsh",       // hyperplane constants × corpus (broadcast)
    "x_outliers",      // global mean/stddev singleton × rows (broadcast)
    "x_decay_features", // reference-time singleton × rows (broadcast)
    "j6_cross_join",    // the operator under test IS an explicit small-dim cross
    "x_ann_ivf",        // corpus × broadcast coarse-quantizer centroids
    "x_ann_ivf_trained", // same, trained centroid table (nList rows, broadcast)
    "x_ann_pq",         // corpus × broadcast one-row codebook; query LUTs × codes
    "x_tfidf",          // docs × broadcast corpus-size singleton (idf denominator)
    "x_heavy_hitters",  // recounted candidates × broadcast total-count singleton
    "x_vocab_encode",   // docs × broadcast one-row top-V vocabulary array
    "tpch_q11",         // per-part values × broadcast global-threshold singleton
    "tpch_q22",         // customers × broadcast positive-balance-average singleton
    "x_lm_score",       // bigrams × broadcast vocabulary-size singleton (smoothing V)
    "x_bm25",           // term hits × broadcast corpus-stats singleton (N, avgdl)
    "x_target_encode",  // category sums × broadcast global-prior singleton
    "x_eq_depth_hist",  // rows × broadcast quartile-cutpoints singleton
    "x_growth_accounting", // churn weeks × broadcast max-week horizon singleton
    "x_lift",           // type pairs × broadcast distinct-user-count singleton
    "x_rolling_actives", // window-day rows × broadcast max-day horizon singleton
    "x_benford",        // digit counts × broadcast total-count singleton
    "x_concentration",  // ranked revenues × broadcast customer-count singleton
    "x_auc",            // per-class U terms × broadcast total-count singleton
    "x_cramers_v",      // r×c marginal grid densify (two broadcast aggregated
                        // marginals) + broadcast N / chi2 singletons
    "x_modularity",     // community rows × broadcast edge-count / total-Q
                        // singletons
    "x_silhouette",     // corpus × broadcast ≤|labels| centroid table
    "x_cms_counts",     // exact counts × broadcast one-row sketch grid
    "x_kaplan_meier",   // per-user spans × broadcast observation-end
                        // singleton (censoring horizon)
    "x_ann_recall",     // composes brute-force/IVF/PQ rank tables, so it
                        // inherits their pinned broadcast-singleton loops
    "x_rrf_fusion",     // inherits x_bm25's corpus-stats singleton plus its
                        // own broadcast corpus-size singleton (tf-idf N)
    "x_temperature_mix", // per-source rows × broadcast cross-source
                        // sqrt-denominator singleton (one row)
    "x_blocking_audit", // four 1-row counter singletons crossed into the
                        // single-row audit readout (all broadcast)
    "x_epoch_plan",     // per-source rollup × broadcast source-count
                        // singleton (the budget divisor)
    "x_pr_curve",       // threshold rows × broadcast total-positives
                        // singleton
    "x_kmv_overlap",    // #sources sketch rows × broadcast sketch rows
                        // (O(k)-payload pair table, structurally tiny)
    "x_vocab_growth",   // token first-positions × broadcast ≤26-row
                        // checkpoint ladder
    "x_fs_em",          // ≤8 pattern rows × broadcast 1-row EM parameter
                        // table, once per unrolled round
    "x_er_pairwise",    // four 1-row pair-count singletons crossed into
                        // the single-row metric readout (all broadcast)
    "x_ndcg",           // inherits x_ann_topk's broadcast query-vector
                        // singleton × corpus shape
    "x_map_eval",       // same inherited brute-force ranking shape
    "x_knn_label_noise", // same inherited brute-force ranking shape
    "x_fleiss_kappa",   // 1-row moment singleton × broadcast 1-row
                        // label-marginal singleton
    "x_best_split",     // distinct-value candidates × broadcast 1-row
                        // class-totals singleton
    "x_dsir_select",    // 64 bucket rows × broadcast corpus-totals
                        // singleton (the smoothing denominators)
    "d_embed_neardup",  // vectors × broadcast 1-row adaptive-LSH
                        // bit-count singleton (semanticNearDupPairs
                        // params; the r11 candidate-bounded re-anchor —
                        // d_semantic_keep runs the same shape but its
                        // eager CC loop hides it from the final plan)
    "x_doremi_mix",     // ≤ #sources rows × broadcast 1-row normalizer,
                        // once per multiplicative-weights round
    "st_drift_stream"   // reference bins × broadcast distinct-hours
                        // singleton (the hourly-average divisor)
  )

  test("no query plans an unintended cartesian or nested-loop join") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val cartesian = plan.contains("CartesianProduct")
        val loop = plan.contains("BroadcastNestedLoopJoin")
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (loop && !broadcastLoopOk(name)) Some(s"$name: BroadcastNestedLoopJoin")
        else None
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
