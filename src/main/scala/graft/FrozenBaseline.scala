package graft

/** The operative per-query 2x-gate reference: ONE number per query,
  * 88 measured in ONE run under ONE context (+2 round-8 rows and one
  * triaged re-freeze, marked inline) — `graft.Bench` full
  * run (min-of-3 timed reps, plans warmed on sf0.001, full
  * materialization) at sf0.1, local[32], 32 shuffle partitions, idle
  * box, 2026-08-13, post-round-7 plan changes (ANN aggregator rank,
  * q26/q31 distributed readback), total 54.4 s, gc_sec 1.7. (The first 83-query freeze run an hour
  * earlier measured 53.6 s; this run re-measured every pre-existing
  * query at 1.01x aggregate with zero rows over 2x — the freeze
  * context is reproducible — and adds the three round-7 queries.)
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
    "sf0.1, local[32], 32 shuffle partitions, idle box, 2026-08-13 r7; " +
    "harness since r12: reps interleaved across passes + codegen cache " +
    "5000 (both strictly reduce measured times vs the r7 context, so " +
    "ratios against this table err conservative — BASELINE.md r12 triage)"

  val sec: Map[String, Double] = Map(
    "ann_brute_force_topk" -> 0.26,
    "ann_filtered_topk" -> 0.31,
    "ann_ivf_topk" -> 0.44,
    "ann_lsh_topk" -> 0.48,
    "cdc_upsert_apply" -> 0.32,
    "dedup_clusters" -> 5.22,
    "dedup_embedding_cosine" -> 1.06,
    "dedup_exact" -> 0.28,
    "dedup_minhash_lsh" -> 4.20,
    "dedup_ngram_jaccard" -> 6.07,
    "dedup_semantic_ivf" -> 0.38,
    "dedup_simhash" -> 1.05,
    "e15_conditional_path" -> 0.55,
    "e2_jsonpath_props" -> 0.53,
    "e2b_jsonpath_indefinite" -> 0.73,
    "emb_covariance_q" -> 0.37,
    "emb_kmeans_assign" -> 0.43,
    "emb_kmeans_update" -> 0.24,
    "emb_quantize_int8" -> 0.36,
    "m1_retry_fold" -> 0.78,
    "m3_handler_fold" -> 0.46,
    "m4_interrupt_fold" -> 0.44,
    "m6_stop_resume" -> 0.81,
    "maint_compact_files" -> 0.26,
    "maint_histogram" -> 0.18,
    "maint_histogram_analyzed" -> 1.04,
    "maint_table_stats" -> 0.61,
    // re-frozen round 8: the r7 0.15 floor no longer reproduces even
    // isolated (BenchOne min-of-14 = 0.26 on an idle box, no code
    // change on the path since the freeze — host I/O drift on a
    // sub-second scan-bound query); BASELINE.md round-8 triage
    "mm_binary_stats" -> 0.26,
    "mm_feature_extract" -> 0.24,
    "mm_frame_sample" -> 0.31,
    "n2_external_event_timeout" -> 0.65,
    "n3_threads_locks" -> 0.56,
    "pack_sequences" -> 0.18,
    "pipeline_curation" -> 2.20,
    "q10_distinct_agg" -> 0.31,
    "q11_anti_join" -> 0.19,
    "q12_rollup" -> 0.26,
    "q13_events_daily" -> 0.15,
    "q14_scalar_funcs" -> 0.16,
    "q15_events_running_window" -> 0.39,
    "q16_above_avg_orders" -> 0.54,
    "q17_salted_skew_agg" -> 0.20,
    "q18_asof_join" -> 0.62,
    "q19_sql_exists_subquery" -> 0.61,
    "q1_pricing_agg" -> 0.20,
    "q20_datetime_funcs" -> 0.32,
    "q21_sole_problem_supplier" -> 0.59,
    "q22_range_join_binned" -> 0.28,
    "q23_streaming_daily_agg" -> 0.76,
    "q24_sessionization" -> 0.53,
    "q25_topk_aggregator" -> 0.46,
    "q26_stream_stream_join" -> 2.02,
    "q27_bucketed_join" -> 0.22,
    "q28_pivot" -> 0.24,
    "q29_percentile_disc" -> 0.21,
    "q2_filter_pushdown" -> 0.19,
    "q2_var_index_search" -> 0.79,
    "q30_partition_pruned" -> 0.09,
    "q31_streaming_dedup_keys" -> 0.64,
    "q32_schema_evolution" -> 0.13,
    "q33_json_source" -> 0.18,
    "q34_csv_source" -> 0.17,
    "q35_range_frame" -> 0.39,
    "q36_grouping_sets" -> 0.21,
    "q37_full_outer_join" -> 0.34,
    "q38_streaming_sessions" -> 1.37,
    "q39_lateral_topn" -> 0.84,
    // round-8 additions, isolated BenchOne min-of-8 same box/harness
    // (q40 pays 3 micro-batch rounds: real drain + 2 sentinel rounds)
    "q40_stream_left_outer" -> 4.42,
    "maint_histogram_equiheight" -> 0.51,
    "q41_stream_static_join" -> 1.50,
    "q3_shipping_priority" -> 0.43,
    "q4_order_priority_semijoin" -> 0.51,
    "q5_local_supplier" -> 0.57,
    "q6_forecast_revenue" -> 0.15,
    "q7_window_topn" -> 0.39,
    "q8_sort_limit" -> 0.12,
    "q9_set_ops" -> 0.35,
    "r1_mutation_chain" -> 1.13,
    "sample_fixed_k" -> 0.21,
    "sample_stratified" -> 0.38,
    "sample_token_budget" -> 0.24,
    // round-12 addition (α=0.5 temperature source mixing), isolated
    // BenchOne min-of-8 same box/harness: floor 0.32, warm band
    // 0.32-0.52
    "sample_temperature_mix" -> 0.32,
    // round-12 additions (incremental batch-vs-corpus dedup; unigram
    // surprisal scoring), isolated BenchOne min-of-8 same box/harness:
    // floors 1.57 / 0.56, warm bands 1.6-3.0 / 0.6-0.9
    "dedup_incremental" -> 1.57,
    "text_perplexity_unigram" -> 0.56,
    // round-12 addition (ordered 3-step conversion funnel), isolated
    // BenchOne min-of-8 same box/harness: floor 0.58, warm band 0.6-1.1
    "q42_funnel_steps" -> 0.58,
    // round-12 batch-A additions (SCD2 history build; TPC-H Q2-shape
    // min-cost supplier, single-scan window decorrelation; z-order
    // clustering stats), isolated BenchOne min-of-8 same box/harness:
    // floors 0.35 / 0.71 / 0.24, warm bands 0.35-0.50 / 0.71-1.41 /
    // 0.24-0.31
    "cdc_scd2_history" -> 0.35,
    "q43_min_cost_supplier" -> 0.71,
    "maint_zorder_cluster" -> 0.24,
    // round-12 batch-B additions (KMV NDV sketch; count-min frequency
    // sketch; SQ8 quantized ANN), isolated BenchOne min-of-8 same
    // box/harness: floors 0.81 / 0.40 / 0.42, warm bands 0.81-1.33 /
    // 0.40-0.62 / 0.42-0.67
    "sketch_kmv_ndv" -> 0.81,
    "sketch_cms_freq" -> 0.40,
    "ann_int8_topk" -> 0.42,
    // round-12 batch-C additions (CMS-prefiltered exact heavy
    // hitters; streaming KMV cardinality; interpolated percentiles),
    // isolated BenchOne min-of-8 same box/harness: floors 0.65 /
    // 0.89 / 0.95, warm bands 0.65-0.98 / 0.89-1.13 / 0.95-1.11
    "sketch_heavy_hitters" -> 0.65,
    "q44_streaming_kmv" -> 0.89,
    // re-frozen same day: the first (window) formulation measured a
    // 3-partition sort cliff at the decades (8.2 s at 10x, 88.8 s at
    // 100x); rewritten to distributed rank selection — 1x floor 1.09
    // (vs 0.95), 10x 2.97, 100x 15.4. BASELINE.md round-12 batch C.
    "q45_percentile_cont" -> 1.09,
    // round-12 batch-D additions (incremental view maintenance;
    // integer-quantized 3-iteration PageRank; per-group KMV), isolated
    // BenchOne min-of-8 same box/harness: floors 0.65 / 1.98 / 0.24,
    // warm bands 0.65-0.97 / 1.98-3.0 / 0.24-0.34
    "cdc_incremental_agg" -> 0.65,
    "graph_pagerank_q" -> 1.98,
    "sketch_kmv_grouped" -> 0.24,
    // round-12 batch-E additions (asymmetric containment near-dup —
    // exact, full-inverted-index side, validator-class like
    // dedup_ngram_jaccard; streaming SCD1 upsert view; JSON
    // schema-on-read), isolated BenchOne min-of-8 same box/harness:
    // floors 4.88 / 1.20 / 0.39, warm bands 4.9-6.8 / 1.2-1.5 /
    // 0.39-0.45
    // re-frozen same day at the FULL-BENCH context min (first freeze
    // 4.88 used the isolated floor — the wrong context for this
    // spill-heavy validator: in-suite reps measured 10.9/31.6/34.7
    // while the isolated floor reproduced at 5.16, the
    // ngram_jaccard-style context-pressure profile; the gate artifact
    // is a full-bench run, so the frozen row must carry the
    // full-bench context like the r7 table rows do). BASELINE.md
    // round-12 batch-E triage.
    "dedup_containment" -> 10.93,
    "q47_stream_scd1_latest" -> 1.20,
    "q46_json_extract" -> 0.39,
    // round-12 batch-F addition (z-order OPTIMIZE rewrite: scaled
    // interleave, range-partitioned write; floor times the content
    // check, the one-time layout write is rep-1), isolated BenchOne
    // min-of-8: floor 0.32, warm band 0.32-0.51
    "maint_zorder_write" -> 0.32,
    // round-12 batch-G additions (calendar gap-fill densification;
    // per-user forward-fill with IGNORE NULLS), isolated BenchOne
    // min-of-8: floors 0.42 / 0.57, warm bands 0.42-0.70 / 0.57-0.75
    "q48_calendar_fill" -> 0.42,
    "q49_fill_forward" -> 0.57,
    // round-12 batch-H additions (cohort retention matrix;
    // quality-aware dedup keeper — composite over the full
    // minhash+label-prop pipeline, cost tracks dedup_clusters),
    // isolated BenchOne min-of-8: floors 0.37 / 5.07, warm bands
    // 0.37-0.76 / 5.1-5.9
    "q50_cohort_retention" -> 0.37,
    "pipeline_dedup_keeper" -> 5.07,
    // round-12 batch-I addition (TPC-H Q22 shape: global scalar
    // threshold + recency anti-join), isolated BenchOne min-of-8:
    // floor 0.95, warm band 0.95-1.6
    "q51_idle_rich_customers" -> 0.95,
    // round-12 batch-I addition (7-day trailing distinct users —
    // non-decomposable window aggregate via expand-then-dedup),
    // isolated BenchOne min-of-8: floor 0.36, warm band 0.36-0.57
    "q52_trailing_distinct" -> 0.36,
    "text_decontaminate" -> 0.60,
    "text_fingerprint" -> 0.47,
    "text_langid" -> 0.45,
    "text_pii_scrub" -> 3.23,
    "text_quality_score" -> 0.37,
    "text_repetition_stats" -> 0.44,
    "text_rolling_fingerprint" -> 0.13,
    "text_tfidf_top_terms" -> 0.57,
    "text_token_count" -> 0.34,
    "text_vocab_coverage" -> 0.37,
    // round-13 batch-A additions, isolated BenchOne min-of-8 same
    // box/harness (ranking-window suite; multiset set-ops; bloom
    // runtime-filter join; streaming HLL; watermarked bounded-state
    // dedup; batch HLL registers; weighted priority sampling; bigram
    // LM surprisal; shard manifest; zone-map file skipping): floors
    // 0.70 / 0.54 / 0.51 / 1.23 / 1.21 / 0.40 / 0.24 / 1.12 / 0.20 /
    // 0.31, warm bands up to ~2-3× floor (first-rep codegen warmup)
    "q53_window_funcs" -> 0.70,
    "q54_multiset_ops" -> 0.54,
    "q55_bloom_join_prune" -> 0.51,
    "q56_streaming_hll" -> 1.23,
    "q57_stream_dedup_bounded" -> 1.21,
    "sketch_hll_registers" -> 0.40,
    "sample_weighted" -> 0.24,
    "text_perplexity_bigram" -> 1.12,
    "mm_shard_manifest" -> 0.20,
    "maint_file_skipping" -> 0.31,
    // round-13 batch-A, measured post-tuning (BFS layered-union
    // checkpoint fix; PQ with unit-normalize): isolated BenchOne
    // min-of-6 floors 2.50 / 0.49. graph_reachability is
    // fixed-overhead-dominated (≈10 tiny jobs across 4 hops), hence
    // the wide warm band (2.5-12 under host bursts)
    "graph_reachability" -> 2.50,
    "ann_pq_topk" -> 0.49,
    // round-13 batch-B additions (BM25 retrieval; overlap chunking;
    // split assignment; co-supply triangle census; time-travel
    // snapshot read; PCA power iteration), isolated BenchOne min-of-6
    // same box/harness: floors 1.33 / 0.34 / 0.20 / 2.16 / 0.55 /
    // 0.38. maint_snapshot_read's warm band is wide (first reps pay
    // the one-time versioned-store build + write-path JIT)
    "text_bm25_topk" -> 1.33,
    "text_chunk_overlap" -> 0.34,
    "sample_split_assign" -> 0.20,
    "graph_triangles" -> 2.16,
    "maint_snapshot_read" -> 0.55,
    "emb_pca_power_iter" -> 0.38,
    // round-13 batch-C additions (streaming CMS; all-but-the-top
    // projection; KMV degree histogram), isolated BenchOne min-of-6
    // same box/harness: floors 1.13 / 0.58 / 2.15
    "q58_streaming_cms" -> 1.13,
    "emb_abtt_project" -> 0.58,
    "graph_degree_histogram" -> 2.15,
    // round-13 batch-D additions (prefix-scan skyline; integer MAD),
    // isolated BenchOne min-of-6 same box/harness: floors 0.86 / 0.93
    "q59_skyline" -> 0.86,
    "q60_mad_robust" -> 0.93,
    // round-13 batch-E additions (composite RAG-ingest pipeline;
    // HDR-style log-bucket quantile sketch), isolated BenchOne
    // min-of-6 same box/harness: floors 0.63 / 0.43
    "pipeline_rag_index" -> 0.63,
    "sketch_hdr_quantiles" -> 0.43,
    // round-13 batch-G additions (snapshot transition diff;
    // farthest-point coreset), isolated BenchOne min-of-6 same
    // box/harness: floors 1.09 / 1.33
    "maint_snapshot_diff" -> 1.09,
    "sample_coreset_fps" -> 1.33,
    // round-13 batch-H additions (streaming HDR quantiles; DSIR
    // importance weights), isolated BenchOne min-of-6 same
    // box/harness: floors 1.13 / 0.85
    "q61_streaming_hdr" -> 1.13,
    "sample_dsir_weights" -> 0.85,
    // round-13 batch-J additions (event-transition matrix; robust
    // per-type outlier flags), isolated BenchOne min-of-6 same
    // box/harness: floors 0.76 / 0.66
    "q62_event_transitions" -> 0.76,
    "q63_robust_outliers" -> 0.66,
    // round-13 batch-K additions (cross-doc span census; ranked
    // shared-shingle similarity), isolated BenchOne min-of-6 same
    // box/harness: floors 1.10 / 1.51
    "dedup_span_crossdoc" -> 1.10,
    "text_doc_similarity" -> 1.51,
    // round-13 batch-L additions (data-quality profile; referential
    // audit), isolated BenchOne min-of-6 same box/harness:
    // floors 1.30 / 1.62
    "dq_profile" -> 1.30,
    "dq_referential" -> 1.62,
    // round-13 batch-M addition (per-dimension embedding energy),
    // isolated BenchOne min-of-6 same box/harness: floor 0.32
    "emb_dim_energy" -> 0.32,
    // round-13 batch-N addition (streaming sliding-window rollup),
    // isolated BenchOne min-of-6 same box/harness: floor 1.44
    "q64_streaming_sliding" -> 1.44,
    // round-13 batch-O additions (fixed-breakpoint RFM; as-of with
    // tolerance), isolated BenchOne min-of-6 same box/harness:
    // floors 0.64 / 0.71
    "q65_rfm_segments" -> 0.64,
    "q66_asof_tolerance" -> 0.71,
    // round-13 batch-P additions (partitioned ntile/rank windows;
    // winnowing fingerprint selection), isolated BenchOne min-of-6
    // same box/harness: floors 0.42 / 0.42
    "q67_ntile_ranks" -> 0.42,
    "text_winnowing" -> 0.42,
    // round-13 batch-Q addition (pretraining data-funnel report),
    // isolated BenchOne min-of-6 same box/harness: floor 1.10
    "pipeline_data_funnel" -> 1.10,
    // round-13 batch-R addition (KMV set-operation estimates),
    // isolated BenchOne min-of-6 same box/harness: floor 0.61
    "sketch_kmv_setops" -> 0.61,
    // round-13 batch-S additions (co-purchase top-k; JL random
    // projection), isolated BenchOne min-of-6 same box/harness:
    // floors 2.43 / 0.45
    "graph_copurchase_topk" -> 2.43,
    "emb_random_projection" -> 0.45,
    // round-13 batch-T addition (ORC source round-trip), isolated
    // BenchOne min-of-6 same box/harness: floor 0.30
    "q68_orc_source" -> 0.30,
    // round-13 batch-U addition (dynamic partition pruning), isolated
    // BenchOne min-of-6 same box/harness: floor 0.68
    "q69_dpp_hot_days" -> 0.68,
    // round-13 batch-V additions (exact decimal money path;
    // collection-function surface), isolated BenchOne min-of-6 same
    // box/harness: floors 0.57 / 1.08
    "q70_decimal_agg" -> 0.57,
    "q71_complex_types" -> 1.08,
    // round-13 batch-W additions (HOF vector stats; dow×hour
    // heatmap), isolated BenchOne min-of-6 same box/harness:
    // floors 0.44 / 0.34
    "emb_vector_stats_hof" -> 0.44,
    "q72_dow_hour_heatmap" -> 0.34,
    // round-13 batch-X additions (CMS-prefiltered exact chunk dedup;
    // CUBE), isolated BenchOne min-of-6 same box/harness:
    // floors 0.84 / 0.26
    "dedup_cms_prefilter" -> 0.84,
    "q73_cube" -> 0.26,
    // round-13 batch-Y addition (three-layer dedup cascade report),
    // isolated BenchOne min-of-6 same box/harness: floor 3.08
    "pipeline_dedup_cascade" -> 3.08,
    // round-13 batch-Z addition (portable regex surface), isolated
    // BenchOne min-of-6 same box/harness: floor 0.35
    "q74_regex_funcs" -> 0.35,
  )
}
