package graft

/** SINGLE SOURCE OF TRUTH for the SQL-parity gate (r8 verdict item 2):
  * every §2.B contract key must be in exactly one of these four sets, and
  * SqlParityContractSpec asserts the partition is total and disjoint — a
  * new `SparkEntry.queries` key that lands without a twin or a documented
  * exemption FAILS the build, the same way SurveyContractSpec pins the
  * oracle exemption.
  *
  *  - [[handTwins]]: keys with a hand-written Spark-SQL twin asserted
  *    row-for-row in SqlParitySpec (each assertParity call self-registers;
  *    SqlParitySpec's closing test asserts the registered set == this set,
  *    so the list cannot drift from the spec body — ADVICE r9 item 1).
  *  - [[oracleReuse]]: keys whose DuckDB oracle SQL from
  *    `SparkEntry.oracleSql` is ALSO valid Spark SQL producing identical
  *    results — asserted mechanically, one test per key, in
  *    SqlOracleReuseSpec. Zero duplicated SQL text.
  *  - [[dialectTwins]]: keys whose oracle SQL is DuckDB-only dialect (or,
  *    for the HLL key, nonexistent), with a construct-for-construct Spark
  *    rewrite in [[SqlDialectTwins]] asserted per-key by
  *    SqlDialectTwinSpec.
  *  - [[exempt]]: keys with NO expressible Spark SQL twin. Each carries
  *    the concrete engine gap as its reason — an asserted contract, not
  *    silent debt.
  */
object SqlParityKeys {

  val handTwins: Set[String] = Set(
    "q_filter", "q_join_inner", "q_agg_groupby", "q_window_rank",
    "q_union_distinct", "q_string_funcs", "q_tumbling_window",
    "q_dedup_exact", "q_split_sample", "q_stratified_sample",
    "q_dedup_incremental", "q_token_budget", "q_grouping_sets", "q_pivot",
    "q_median_mode", "q_doc_chunk", "q_window_frame_range", "q_rollup",
    "q_agg_percentiles", "q_interval_arith", "q_date_spine",
    "q_topk_per_group", "q_sessionize", "q_pmi_bigrams", "q_event_enrich",
    "q_expr_go_ts", "q_unpivot", "q_agg_filtered", "q_scalar_subquery",
    "q_join_asof", "q_correlated_subquery", "q_window_ignore_nulls",
    "q_repetition_score", "q_funnel", "q_zorder", "q_null_semantics")

  val oracleReuse: Set[String] = Set(
    "q_agg_distinct", "q_agg_global", "q_agg_salted", "q_agg_stats",
    "q_anomaly_mad", "q_event_transitions", "q_rfm", "q_pagerank",
    "q_bloom_prefilter", "q_stream_topk", "q_agg_incremental",
    "q_anomaly_zscore", "q_conditional", "q_cube", "q_event_validate",
    "q_except", "q_histogram", "q_intersect", "q_join_anti",
    "q_join_broadcast", "q_join_full", "q_join_left", "q_join_multiway",
    "q_join_range", "q_join_range_fact", "q_join_salted", "q_join_semi",
    "q_join_theta", "q_limit_offset", "q_math_funcs", "q_scan_project",
    "q_scan_pushdown", "q_scd2", "q_session_window", "q_sort_multi",
    "q_stateful_running", "q_stream_dedup", "q_stream_join",
    "q_topk_global", "q_udaf_geomean", "q_union_all", "q_upsert",
    "q_watermark_late", "q_window_analytic", "q_window_frame_rows",
    "q_window_percent", "q_window_running",
    "q_ewma", "q_changepoint", "q_bfs_hops", "q_feature_scale",
    "q_skyline", "q_path_mining", "q_degree_dist", "q_funnel_window",
    "q_basket_lift", "q_ab_ttest", "q_not_in_nulls", "q_corr_matrix",
    "q_linreg", "q_chi_square", "q_gini",
    "q_domain_stats", "q_snapshot_drift",
    "q_auc", "q_ks_test",
    "q_calibration", "q_psi", "q_spearman", "q_benford", "q_lift_curve",
    "q_yoy_growth", "q_ntile_bins",
    "q_target_encode", "q_woe_iv", "q_ranking_metrics", "q_tree_paths",
    "q_sssp", "q_mutual_info", "q_winsorize", "q_schema_profile",
    "q_effect_size", "q_quantile_bands", "q_impute",
    "q_pr_auc", "q_mann_whitney")

  /** Keys with a Spark-dialect hand twin in [[SqlDialectTwins]] (the
    * oracle rewritten construct-for-construct; asserted one test per key
    * by SqlDialectTwinSpec). Derived from the twin map itself so the two
    * cannot drift. */
  val dialectTwins: Set[String] = SqlDialectTwins.twins.keySet

  /** key -> the concrete engine gap blocking ANY Spark SQL twin (probed
    * 2026-08-13 via SqlTwinProbe + SqlDialectTwins drafting). */
  val exempt: Map[String, String] = Map(
    "q_connected_components" -> ("graph closure needs a cycle-safe " +
      "UNION-distinct fixpoint; Spark 4.1 recursive CTEs allow only " +
      "UNION ALL ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]), which diverges " +
      "on cyclic edges, AND forbid aggregates over the recursive " +
      "reference ([INVALID_RECURSIVE_REFERENCE.PLACE], probed r10), which " +
      "rules out the bounded min-label-propagation alternative. DSL uses " +
      "pointer-doubling; oracle-checked by the driver gate instead"),
    "q_dedup_cluster_rep" -> ("same UNION-distinct recursion gap as " +
      "q_connected_components (nests the same closure)"),
  )

  val covered: Set[String] = handTwins ++ dialectTwins ++ oracleReuse
}
