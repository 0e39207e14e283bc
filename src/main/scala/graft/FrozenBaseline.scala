package graft

/** The operative per-query 2x-gate reference: ONE number per query,
  * all 83 measured in ONE run under ONE context — `graft.Bench` full
  * run (min-of-3 timed reps, plans warmed on sf0.001, full
  * materialization) at sf0.1, local[32], 32 shuffle partitions, idle
  * box, 2026-08-13, post-round-7 plan changes (ANN aggregator rank,
  * q26/q31 distributed readback), total 53.6 s, gc_sec 1.4.
  *
  * Bench emits `vs_frozen` = measured/frozen per query in its JSON so
  * every BENCH_r{N} artifact is self-gating against this table; rows
  * over 2x carry the in-artifact `over_2x` flag and get triaged per
  * BASELINE.md's pinned protocol (isolated `BenchOne` min-of-N).
  * History and superseded tables live in BASELINE.md's appendix.
  */
object FrozenBaseline {
  val methodology: String =
    "full-bench min-of-3, plans warmed on sf0.001, full materialization, " +
    "sf0.1, local[32], 32 shuffle partitions, idle box, 2026-08-13 r7"

  val sec: Map[String, Double] = Map(
    "ann_brute_force_topk" -> 0.29,
    "ann_filtered_topk" -> 0.30,
    "ann_ivf_topk" -> 0.43,
    "ann_lsh_topk" -> 0.40,
    "dedup_clusters" -> 4.51,
    "dedup_embedding_cosine" -> 0.79,
    "dedup_exact" -> 0.16,
    "dedup_minhash_lsh" -> 4.18,
    "dedup_ngram_jaccard" -> 5.69,
    "dedup_semantic_ivf" -> 0.35,
    "dedup_simhash" -> 0.98,
    "e15_conditional_path" -> 0.49,
    "e2_jsonpath_props" -> 0.47,
    "e2b_jsonpath_indefinite" -> 0.71,
    "emb_kmeans_assign" -> 0.43,
    "emb_kmeans_update" -> 0.23,
    "emb_quantize_int8" -> 0.37,
    "m1_retry_fold" -> 0.74,
    "m3_handler_fold" -> 0.51,
    "m4_interrupt_fold" -> 0.49,
    "m6_stop_resume" -> 0.80,
    "maint_compact_files" -> 0.23,
    "maint_histogram" -> 0.16,
    "maint_table_stats" -> 0.62,
    "mm_binary_stats" -> 0.15,
    "mm_feature_extract" -> 0.24,
    "mm_frame_sample" -> 0.30,
    "n2_external_event_timeout" -> 0.70,
    "n3_threads_locks" -> 0.64,
    "pack_sequences" -> 0.20,
    "pipeline_curation" -> 2.30,
    "q10_distinct_agg" -> 0.29,
    "q11_anti_join" -> 0.21,
    "q12_rollup" -> 0.28,
    "q13_events_daily" -> 0.16,
    "q14_scalar_funcs" -> 0.19,
    "q15_events_running_window" -> 0.39,
    "q16_above_avg_orders" -> 0.49,
    "q17_salted_skew_agg" -> 0.20,
    "q18_asof_join" -> 0.59,
    "q19_sql_exists_subquery" -> 0.63,
    "q1_pricing_agg" -> 0.22,
    "q20_datetime_funcs" -> 0.32,
    "q21_sole_problem_supplier" -> 0.63,
    "q22_range_join_binned" -> 0.31,
    "q23_streaming_daily_agg" -> 0.73,
    "q24_sessionization" -> 0.47,
    "q25_topk_aggregator" -> 0.41,
    "q26_stream_stream_join" -> 1.76,
    "q27_bucketed_join" -> 0.20,
    "q28_pivot" -> 0.23,
    "q29_percentile_disc" -> 0.21,
    "q2_filter_pushdown" -> 0.20,
    "q2_var_index_search" -> 0.78,
    "q30_partition_pruned" -> 0.09,
    "q31_streaming_dedup_keys" -> 0.64,
    "q32_schema_evolution" -> 0.13,
    "q33_json_source" -> 0.17,
    "q34_csv_source" -> 0.19,
    "q35_range_frame" -> 0.36,
    "q36_grouping_sets" -> 0.19,
    "q37_full_outer_join" -> 0.27,
    "q38_streaming_sessions" -> 1.19,
    "q3_shipping_priority" -> 0.41,
    "q4_order_priority_semijoin" -> 0.53,
    "q5_local_supplier" -> 0.68,
    "q6_forecast_revenue" -> 0.14,
    "q7_window_topn" -> 0.45,
    "q8_sort_limit" -> 0.14,
    "q9_set_ops" -> 0.43,
    "r1_mutation_chain" -> 1.46,
    "sample_fixed_k" -> 0.25,
    "sample_stratified" -> 0.45,
    "sample_token_budget" -> 0.33,
    "text_decontaminate" -> 0.72,
    "text_fingerprint" -> 0.56,
    "text_langid" -> 0.47,
    "text_pii_scrub" -> 2.85,
    "text_quality_score" -> 0.32,
    "text_repetition_stats" -> 0.39,
    "text_rolling_fingerprint" -> 0.12,
    "text_tfidf_top_terms" -> 0.58,
    "text_token_count" -> 0.33,
  )
}
