package graft

/** SINGLE SOURCE OF TRUTH for the SQL-parity gate (r8 verdict item 2):
  * every §2.B contract key must be in exactly one of these three sets, and
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
  *  - [[exempt]]: keys whose oracle SQL leans on DuckDB-only dialect
  *    (string_split / unnest-in-select / strlen / VARCHAR / DOUBLE[] / …)
  *    and that have no hand twin YET. Each carries the concrete dialect
  *    gap as its reason; shrinking this map by writing twins is tracked
  *    work, not silent debt.
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
    "q_anomaly_zscore", "q_conditional", "q_cube", "q_event_validate",
    "q_except", "q_histogram", "q_intersect", "q_join_anti",
    "q_join_broadcast", "q_join_full", "q_join_left", "q_join_multiway",
    "q_join_range", "q_join_range_fact", "q_join_salted", "q_join_semi",
    "q_join_theta", "q_limit_offset", "q_math_funcs", "q_scan_project",
    "q_scan_pushdown", "q_scd2", "q_session_window", "q_sort_multi",
    "q_stateful_running", "q_stream_dedup", "q_stream_join",
    "q_topk_global", "q_udaf_geomean", "q_union_all", "q_upsert",
    "q_watermark_late", "q_window_analytic", "q_window_frame_rows",
    "q_window_percent", "q_window_running")

  /** key -> the DuckDB-dialect construct blocking verbatim reuse (probed
    * 2026-08-13 via SqlTwinProbe; re-probe before trusting after oracle
    * edits). Writing a Spark-dialect hand twin moves a key to handTwins. */
  val exempt: Map[String, String] = Map(
    "q_agg_approx_distinct" -> "no oracle at all (HLL sketch; rsd bound pinned by ApproxDistinctSpec)",
    "q_agg_collect" -> "array_to_string",
    "q_ann_ivf" -> "DOUBLE[] cast syntax",
    "q_array_funcs" -> "DuckDB list-literal/slice syntax",
    "q_batch_assignment" -> "strlen",
    "q_batch_payload" -> "strlen",
    "q_bitwise_funcs" -> "xor() function (Spark: ^ operator)",
    "q_bm25" -> "list_filter",
    "q_cast_types" -> "CAST(.. AS VARCHAR) needs length in Spark",
    "q_connected_components" -> "string_split",
    "q_corpus_mix" -> "hex string literal cast to BIGINT",
    "q_date_funcs" -> "strftime",
    "q_dedup_cluster_rep" -> "string_split",
    "q_dedup_embed" -> "DOUBLE[] cast syntax",
    "q_dedup_minhash" -> "string_split",
    "q_dedup_ngram" -> "string_split",
    "q_dedup_simhash" -> "unnest in select list",
    "q_doc_fingerprint" -> "unnest in select list",
    "q_embed_quantize" -> "DOUBLE[] cast syntax",
    "q_eval_contamination" -> "string_split",
    "q_event_size" -> "strlen",
    "q_explode" -> "list-position semantics differ (probe DIFF)",
    "q_fuzzy_match" -> "unnest in select list",
    "q_interpolate" -> "IGNORE NULLS placement parse gap",
    "q_json_funcs" -> "json_extract_string",
    "q_lang_id" -> "unnest in select list",
    "q_map_funcs" -> "array_to_string",
    "q_multimodal_meta" -> "'text/plain' literal parse gap after CAST",
    "q_pii_scrub" -> "CAST(.. AS VARCHAR) needs length in Spark",
    "q_quality_score" -> "string_split + integer-division operator",
    "q_regex_funcs" -> "regexp_matches",
    "q_retention" -> "date_diff quoted-unit form",
    "q_send_path" -> "strlen",
    "q_seq_pack" -> "string_split",
    "q_similarity_topk" -> "DOUBLE[] cast syntax",
    "q_sliding_window" -> "time_bucket",
    "q_stream_agg_chain" -> "time_bucket",
    "q_table_checksum" -> "CAST(.. AS VARCHAR) needs length in Spark",
    "q_text_search" -> "list_filter",
    "q_text_stats" -> "string_split",
    "q_text_tokenize" -> "unnest in select list",
    "q_tfidf" -> "unnest in select list",
    "q_token_count" -> "string_split",
    "q_try_funcs" -> "CAST(.. AS VARCHAR) needs length in Spark",
    "q_udf_scalar" -> "strlen",
    "q_unigram_lm" -> "unnest in select list",
  )

  val covered: Set[String] = handTwins ++ oracleReuse
}
