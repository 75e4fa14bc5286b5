package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 guard for the SparkEntry split (VERDICT r10 item #2): the
  * per-family registration files under graft/entry/ must compose to EXACTLY
  * the round-10 416-name map — same names, zero query/oracle drift, no
  * accidental shadowing between families (Map ++ silently keeps the last
  * binding for a duplicated key, so disjointness must be asserted, not
  * assumed). New queries belong in exactly one family file AND this pin. */
class EntryCompositionSpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("Core", EntryCore.queries, EntryCore.sql),
      ("Relational", EntryRelational.queries, EntryRelational.sql),
      ("Business", EntryBusiness.queries, EntryBusiness.sql),
      ("Agg", EntryAgg.queries, EntryAgg.sql),
      ("Stats", EntryStats.queries, EntryStats.sql),
      ("TimeSeries", EntryTimeSeries.queries, EntryTimeSeries.sql),
      ("Text", EntryText.queries, EntryText.sql),
      ("Dedup", EntryDedup.queries, EntryDedup.sql),
      ("Similarity", EntrySimilarity.queries, EntrySimilarity.sql),
      ("Graph", EntryGraph.queries, EntryGraph.sql),
      ("ModelEval", EntryModelEval.queries, EntryModelEval.sql),
      ("Pipeline", EntryPipeline.queries, EntryPipeline.sql),
      ("TrainData", EntryTrainData.queries, EntryTrainData.sql))

  /** The round-10 gate surface, pinned name by name. Additions are fine —
    * append here — but a DISAPPEARING name means the split dropped a query. */
  private val pinnedR10: Set[String] = Set(
    "ab_cuped_lift", "ab_sequential_sprt", "ab_srm_check",
    "ab_test_lift", "agg_bloom_cardinality", "agg_bounded_distinct",
    "agg_cms_heavy_change", "agg_cms_merge", "agg_collect",
    "agg_corr", "agg_count_min", "agg_cube",
    "agg_distinct_rollup", "agg_equidepth", "agg_f2_ams",
    "agg_grouping_sets", "agg_heavy_hitters", "agg_histogram",
    "agg_hll_estimate", "agg_hll_intersection", "agg_hll_merge",
    "agg_incremental_update", "agg_mode", "agg_percentiles",
    "agg_percentiles_sketch", "agg_regression", "agg_rollup",
    "agg_spearman", "agg_stats", "agg_theta_sketch",
    "agg_topk_merge", "agg_weighted_median", "anomaly_mad",
    "anomaly_zscore", "attribution_last_touch", "attribution_markov",
    "attribution_position", "attribution_shapley", "attribution_time_decay",
    "avro_wire_roundtrip", "cdc_apply", "chunk_documents",
    "csv_wire_roundtrip", "curriculum_interleave", "customers_revenue_concentration",
    "customers_rfm", "dataset_card_stats", "dataset_fingerprint",
    "dataset_fingerprint_by", "dataset_fingerprint_cdc", "date_parse_lenient",
    "decontaminate_overlap", "decontaminate_scrub", "dedup_best_of_cluster",
    "dedup_clusters", "dedup_containment_pairs", "dedup_embedding_clusters",
    "dedup_embedding_pairs", "dedup_exact", "dedup_exact_keep",
    "dedup_impact_audit", "dedup_incremental", "dedup_incremental_bloom",
    "dedup_incremental_bucketed", "dedup_incremental_index", "dedup_latest",
    "dedup_lsh_tuning", "dedup_minhash_estimate", "dedup_minhash_pairs",
    "dedup_minhash_pr", "dedup_minhash_survivors", "dedup_ngram_jaccard",
    "dedup_semantic_cells", "dedup_shingle_sensitivity", "dedup_simhash_pairs",
    "dedup_simhash_tuning", "dedup_substring_apply", "dedup_substring_bloom",
    "dedup_substring_index", "dedup_substring_spans", "dedup_winnowing_pairs",
    "dq_benford", "dq_checks", "dq_duplicate_rows",
    "dq_key_discovery", "dq_partition_audit", "dq_psi_drift",
    "dq_reconciliation", "dq_referential_integrity", "embedding_centroids",
    "embedding_clusters", "embedding_intrinsic_dim", "embedding_matryoshka_eval",
    "embedding_norm_audit", "embedding_outlier_score", "embedding_pca_power",
    "embedding_pca_top2", "embedding_project", "embedding_quantization_error",
    "entity_resolution", "event_sessionize", "event_window_agg",
    "events_anomaly_rate_spike", "events_bot_score", "events_burst_viterbi",
    "events_cep_match", "events_cooccurrence", "events_entropy_rate",
    "events_error_pchart", "events_funnel", "events_funnel_windowed",
    "events_funnel_windows", "events_hourly_heatmap", "events_rolling_active",
    "events_sequence_mining", "events_session_stats", "events_top_paths",
    "events_user_lifecycle", "events_user_stickiness", "export_shards",
    "feature_binning", "feature_corr_matrix", "feature_encoder_table",
    "feature_hashing", "feature_hashing_tuning", "feature_standardize",
    "feature_target_encode", "feature_woe_iv", "features_point_in_time",
    "funnel_time_to_convert", "graph_assortativity", "graph_betweenness",
    "graph_closeness", "graph_clustering_coeff", "graph_conductance",
    "graph_degree_distribution", "graph_eigenvector", "graph_hits",
    "graph_jaccard_neighbors", "graph_kcore", "graph_ktruss",
    "graph_label_propagation", "graph_modularity", "graph_pagerank",
    "graph_ppr", "graph_richclub", "graph_sample_fidelity",
    "graph_shortest_paths", "graph_triangles", "hotels_count",
    "identity_projection", "join_anti", "join_asof",
    "join_asof_forward", "join_asof_nearest", "join_asof_tolerance",
    "join_band_bucketed", "join_bloom_prefilter", "join_broadcast_dims",
    "join_bucketed", "join_cardinality_estimate", "join_cross",
    "join_edit_distance_prefix", "join_full_outer", "join_interval_overlap",
    "join_left_outer", "join_range", "join_salted",
    "join_semi", "join_shuffle_hash", "join_spatial_grid",
    "join_topk_revenue", "json_props_extract", "json_wire_roundtrip",
    "jsonl_file_roundtrip", "layout_bloom_prune", "layout_clustering_depth",
    "layout_compaction_plan", "layout_hilbert", "layout_repartition_plan",
    "layout_zonemap_prune", "layout_zorder", "leakage_audit",
    "markov_absorption_time", "markov_stationary", "markov_transitions",
    "mask_field", "mixture_divergence", "mixture_weights",
    "model_auc", "model_brier", "model_calibration",
    "model_cost_curve", "model_fairness_slices", "model_isotonic_calibration",
    "model_ks", "model_lift_gain", "model_pr_auc",
    "model_threshold_sweep", "multimodal_dedup", "multimodal_frame_features",
    "multimodal_frame_sample", "multimodal_headers", "multimodal_meta",
    "multimodal_pipeline", "multimodal_resize_meta", "multimodal_shard_manifest",
    "nested_event_gaps", "null_guard", "orc_wire_roundtrip",
    "orders_abc_analysis", "orders_backlog_aging", "orders_basket_lift",
    "orders_cohort_ltv", "orders_customer_migration", "orders_discount_response",
    "orders_interarrival", "orders_market_basket", "orders_mix_drift",
    "orders_priority_sla", "orders_size_poisson_fit", "outlier_trim",
    "pack_bestfit_eval", "pack_sequences", "paragraph_dedup",
    "part_skyline", "part_supplier_herfindahl", "pipeline_curation",
    "pipeline_e2e", "pipeline_quality_gate", "pivot_events",
    "privacy_dp_counts", "privacy_dp_mean", "privacy_dp_quantile",
    "privacy_k_anonymity", "privacy_l_diversity", "privacy_noisy_max",
    "privacy_t_closeness", "profile_columns", "projection_pushdown",
    "q1_agg", "quality_model_score", "quality_repetition",
    "recsys_als_step", "recsys_coverage", "recsys_ild",
    "recsys_ips_eval", "recsys_item_cf", "recsys_ndcg",
    "replica_diff", "retention_cohorts", "sample_balanced_lang",
    "sample_reservoir", "sample_reservoir_merge", "sample_stratified",
    "sample_systematic", "sample_temperature", "sample_weighted",
    "scd2_build", "scd2_point_in_time", "schema_evolution_merge",
    "search_hybrid_rrf", "search_phrase", "search_prf_rocchio",
    "sessions_concurrency", "set_except", "set_intersect",
    "set_union", "similarity_hard_negatives", "similarity_ivf_cell_stats",
    "similarity_ivf_drift", "similarity_ivf_recluster", "similarity_knn_graph",
    "similarity_mmr_topk", "similarity_mutual_knn", "similarity_range_search",
    "similarity_recall", "similarity_recall_sweep", "similarity_topk",
    "similarity_topk_int8", "similarity_topk_ivf", "similarity_topk_ivf_append",
    "similarity_topk_ivf_index", "similarity_topk_lsh", "similarity_topk_pq",
    "similarity_topk_pq_index", "similarity_topk_rp", "skew_profile",
    "skew_salted_agg", "sort_limit", "sql_analytics",
    "sql_interface", "sql_recursive", "stats_anderson_darling",
    "stats_anova_f", "stats_bartlett", "stats_benjamini_hochberg",
    "stats_bootstrap", "stats_chi_square", "stats_cochran_q",
    "stats_cohens_kappa", "stats_cramers_v", "stats_did",
    "stats_durbin_watson", "stats_energy_distance", "stats_fisher_exact",
    "stats_friedman", "stats_g_test", "stats_gini_lorenz",
    "stats_gini_monthly", "stats_hodges_lehmann", "stats_jarque_bera",
    "stats_kendall_tau", "stats_kruskal_wallis", "stats_ks_test",
    "stats_levene", "stats_mann_kendall", "stats_mann_whitney",
    "stats_mcnemar", "stats_mutual_information", "stats_permutation_test",
    "stats_power_analysis", "stats_proportion_ztest", "stats_runs_test",
    "stats_tost_equivalence", "stats_turning_points", "stats_welch_ttest",
    "stats_wilcoxon_signed_rank", "stats_xi_correlation", "stay_enrich",
    "string_funcs", "subquery_above_avg", "supplier_return_wilson",
    "survival_km", "survival_weibull_fit", "table_stats",
    "text_bigram_coherence", "text_bm25", "text_boilerplate",
    "text_boilerplate_apply", "text_burstiness", "text_dsir_weights",
    "text_edit_distance", "text_entropy", "text_hashes",
    "text_heaps_law", "text_js_divergence", "text_keywords_tfidf",
    "text_langid", "text_langid_eval", "text_lexical_diversity",
    "text_ngram_lm", "text_normalize", "text_novelty",
    "text_novelty_curve", "text_pii_mask", "text_pmi_cooccur",
    "text_quality", "text_rake_keywords", "text_rarity",
    "text_readability", "text_repetition", "text_tfidf",
    "text_token_count", "text_zipf_fit", "timeseries_acf",
    "timeseries_anomaly_decomposed", "timeseries_autocorr", "timeseries_ccf",
    "timeseries_changepoint", "timeseries_croston", "timeseries_cusum",
    "timeseries_decompose", "timeseries_dtw", "timeseries_ewma",
    "timeseries_forecast_eval", "timeseries_gap_fill", "timeseries_granger",
    "timeseries_haar_energy", "timeseries_holt", "timeseries_holt_winters",
    "timeseries_hurst", "timeseries_kalman_level", "timeseries_ljung_box",
    "timeseries_motif", "timeseries_ohlc", "timeseries_pacf",
    "timeseries_periodogram", "timeseries_rolling_median", "timeseries_sax",
    "timeseries_seasonal_diff", "timeseries_ses_tuning", "timeseries_stl_strength",
    "timeseries_theil_sen", "timeseries_theta", "token_bigrams",
    "token_frequencies", "tokenizer_bpe_apply", "tokenizer_bpe_step",
    "tokenizer_bpe_train", "tokenizer_fertility", "train_crossdup_audit",
    "train_epoch_plan", "train_split", "train_split_grouped",
    "unpivot_metrics", "url_canonicalize", "vector_norms",
    "vocab_coverage", "window_distribution", "window_ntile",
    "window_range_frame", "window_rank_lead", "window_running_sum",
    "window_streaks", "window_topk_per_group")

  test("family query maps are pairwise disjoint") {
    val all = families.flatMap { case (f, qs, _) => qs.keys.map(_ -> f) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"queries registered in multiple families: ${dups.view.mapValues(_.map(_._2)).toMap}")
  }

  test("family oracle maps are pairwise disjoint") {
    val all = families.flatMap { case (f, _, os) => os.keys.map(_ -> f) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"oracles registered in multiple families: ${dups.view.mapValues(_.map(_._2)).toMap}")
  }

  /** Forward-pin discipline (r11 verdict #6): every query added after the
    * r10 416-name pin must be CONSCIOUSLY listed here, in the same commit
    * that registers it in its family file — set-equality below makes an
    * unpinned addition a test failure, not a silent drift. */
  private val newSinceR10: Set[String] = Set(
    "quality_gopher_rules",   // r12: Gopher rule-based quality gate
    "quality_c4_rules",       // r12: C4 cleaning heuristics
    "decontaminate_minhash",  // r12: near-dup decontamination
    "text_watermark_detect",  // r12: green-list watermark z-test
    "train_preference_pairs",  // r12: DPO preference-pair prep
    "mixture_doremi_step",    // r12: DoReMi domain reweighting
    "dq_freshness_audit",     // r12: per-type freshness lag
    "stats_fleiss_kappa",     // r12: multi-rater agreement
    "privacy_pii_prevalence", // r12: per-source PII audit
    "quality_fineweb_rules",  // r12: FineWeb line-level filters
    "quality_ccnet_buckets",  // r12: CCNet per-lang perplexity terciles
    "sample_ess",             // r12: importance-sampling ESS per source
    "stats_krippendorff_alpha", // r12: agreement with missing ratings
    "text_code_detect",       // r12: code-vs-prose mixture classifier
    "mixture_temperature_sweep", // r12: n^tau shares at 4 temperatures
    "quality_gate_agreement", // r12: pairwise kappa between rule gates
    "embedding_isotropy",     // r12: collapse diagnostic (avg pair cos)
    "similarity_kcenter_coreset", // r12: greedy farthest-point selection
    "multimodal_decode_stats", // r13: REAL ImageIO pixel decode round-trip
    "multimodal_audio_decode", // r13: REAL AudioSystem PCM decode round-trip
    "privacy_pii_remediate",  // r13: span-level PII remediation audit
    "train_packing_boundary_audit", // r13: split-policy boundary waste audit
    "decontaminate_ngram_overlap", // r14: exact 13-gram collision policy
    "provenance_license_gate", // r14: license/robots source gating
    "decontaminate_incremental", // r15: batch grams vs materialized index
    "decontaminate_multi_bench") // r15: per-benchmark attribution

  test("composed map equals the pin plus the explicit new-query list") {
    val expected = pinnedR10 ++ newSinceR10
    val actual = SparkEntry.queries.keySet
    val missing = expected -- actual
    val unpinned = actual -- expected
    assert(missing.isEmpty, s"split dropped queries: ${missing.toSeq.sorted}")
    assert(unpinned.isEmpty,
      s"queries registered without a pin entry (add to newSinceR10): " +
        s"${unpinned.toSeq.sorted}")
  }

  test("every query has an oracle and vice versa (zero drift)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("within each family, queries and sql cover the same names (modulo the one cross-family alias)") {
    // dedup_substring_bloom intentionally reuses dedup_substring_index's
    // oracle via SparkEntry.oracleSql's + alias, so its family sql map has
    // no entry of its own.
    val alias = Set("dedup_substring_bloom")
    families.foreach { case (f, qs, os) =>
      val qn = qs.keySet -- alias
      assert(qn == os.keySet,
        s"family $f: only-q=${(qn -- os.keySet).toSeq.sorted} only-sql=${(os.keySet -- qn).toSeq.sorted}")
    }
  }
}
