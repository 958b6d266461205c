"""Regenerate PLANS.md: the formatted physical plan for each headline
query at sf0.01 — the artifact to eyeball for pushdown/pruning/broadcast/
shuffle structure without running anything.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streamprocessing_spark.plans.explain import formatted_plan  # noqa: E402
from streamprocessing_spark.registry import all_specs  # noqa: E402
from streamprocessing_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# Queries whose plans carry the scale story (streaming queries execute on
# .fn() call, so they are documented in SCALE.md instead of dumped here).
PLAN_SET = [
    "app1_pipeline",
    "app2_pipeline",
    "count_by_key",
    "q1_pricing_summary",
    "q5_regional_volume",
    "join_broadcast_dim",
    "join_shuffle_orders_lineitem",
    "top_orders_by_revenue",
    "window_topn_per_group",
    "asof_join_latest_order",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_scaled",
    "dedup_simhash",
    "ann_cosine_topk",
    "srp_lsh_cosine_pairs",
    "ivf_cosine_pairs",
    "triangle_count_copurchase",
    "clustering_coefficient_parts",
    "mad_outlier_events",
    "chunk_documents_windows",
    "duplicate_span_coverage",
    "hll_sketch_rollup_users",
    "dedup_incremental_batch",
    "curation_manifest_end2end",
    "kmeans_embeddings",
    "semantic_dedup_keep_ivf",
    "source_binaryfile_ingest",
    "prototypicality_prune",
    "lang_id_confusion",
    "latest_event_per_user",
    "q18_large_volume_customers",
    "q21_sole_blamed_supplier",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q10_returned_item_customers",
    "q19_disjunctive_predicates",
    "tfidf_top_terms",
    "sessionize_events",
    "forward_fill_last_value",
    "merge_overlapping_intervals",
    "regression_value_by_hour",
    "skyline_orders",
    "zorder_key_orders",
    "range_partition_boundaries",
    "copurchase_lift",
    "decontaminate_benchmark_overlap",
    "cohort_retention",
    "pack_documents_greedy",
    "cdc_apply_changes",
    "kcore_parts",
    "countmin_heavy_hitters",
    "ann_pq_adc_topk",
    "interpolate_hourly_linear",
    "compaction_plan_binpack",
    "incremental_agg_merge",
    "bloom_prefilter_join",
    "label_prop_communities",
    "dedup_jaccard_prefix_filter",
    "snapshot_diff_changelog",
    "inverted_index_postings",
    "multimodal_phash_neardup",
    "bootstrap_ci_value_by_type",
    "bpe_train_segmentation",
    "duplicate_charge_candidates",
    "quantile_normalize_embeddings",
    "pit_join_profile_history",
    "dedup_keep_canonical",
    "token_rarity_score",
    "token_cooccurrence_lift",
    "winsorize_values_by_type",
    "asof_join_next_order_7d",
    "corpus_composition_card",
    "decontaminate_hashed",
    "semantic_dedup_keep",
    "rolling_user_activity_1h",
    "temperature_sample_by_source",
    "pagerank_copurchase",
    "zscore_outlier_events",
    "lateral_top2_customers_per_nation",
    "bm25_rank_docs",
    "bpe_merge_pair_counts",
    # round-2 fourth-continuation flagships
    "sssp_weighted_parts",
    "embedding_gram_matrix",
    "url_domain_stats",
    "domain_blocklist_filter",
    "minhash_jaccard_estimate_audit",
    "split_leakage_audit",
    "fifo_match_returns",
    "nest_order_lineitems",
    "daily_active_user_bitmap",
    "rfm_customer_segments",
    "link_prediction_jaccard",
    "golden_record_parts",
    "cep_click_error_no_purchase",
    "welch_t2_by_event_type",
    "ewma_truncated_user_value",
    "price_volume_mix_decomposition",
    # round-3 flagships
    "srp_lsh_cosine_pairs_scaled",
    "embedding_drift_chi2_by_dim",
    "repetition_dup_trigram_fraction",
    "url_canonical_dedup",
    "multimodal_phash_arrow",
    "cogroup_asof_enrich",
    "sequence_gap_audit",
    "bot_rate_flags",
    # round-3 continuation flagships
    "kneser_ney_bigram_lm",
    "vocab_growth_by_batch",
    "preference_pair_assembly",
    "join_fanout_audit",
    "bucketed_join_revenue",
    "target_encoding_loo",
    "hilbert_key_orders",
    "session_window_batch_agg",
    # round-3 second-session flagships
    "ccnet_perplexity_buckets",
    "dsir_importance_weights",
    "dedup_signal_auc",
    "char_entropy_filter",
    "zipf_law_audit",
    "isotonic_hourly_value",
    "weighted_reservoir_sample",
    "degree_assortativity_parts",
    "user_lis_engagement",
    "ks_two_sample_value",
    "kaplan_meier_activity",
    "unimax_budget_allocation",
    # round-4 additions
    "dedup_containment_join",
    "ngram_novelty_score",
    "interval_overlap_peak_sessions",
    "max_concurrent_sessions_daily",
    "l_diversity_audit",
    "variance_optimal_allocation_sample",
    "clustering_skipping_compare",
    "ann_hubness_audit",
    "blocking_strategy_audit",
    "sessionization_gap_sensitivity",
    "late_arrival_audit",
    "ann_shard_plan",
    "er_match_transitivity_audit",
    "multimodal_dedup_manifest",
    "longest_duplicated_span",
    "funnel_steps_dropoff",
    "dedup_minhash_recall_curve",
    # round-5 additions
    "calibration_ece_audit",
    "annotator_agreement_kappa",
    "mutual_information_source_lang",
    "psi_value_drift",
    "daily_value_autocorrelation",
    "fellegi_sunter_scores",
    "matryoshka_truncation_audit",
    "hybrid_rrf_retrieval",
    "modularity_communities",
    "hits_part_authorities",
    "decontaminate_semantic",
    "emd_value_distributions",
    "hill_tail_index_value",
    "multimodal_silence_ratio",
    "source_ablation_impact",
    "hard_negative_mining",
    "conformal_quality_threshold",
    "lang_id_macro_f1",
    "frequent_triples_apriori",
    "gini_value_inequality",
    "kendall_tau_revenue_volume",
    "markov_entropy_rate",
    "partition_divergence_proof",
    "int8_quantization_recall_audit",
    "rbo_lexical_semantic",
    "shard_balance_audit",
    "packing_efficiency_audit",
    "embedding_anisotropy_audit",
    "sink_python_datasource_roundtrip",
    "shuffle_skew_audit",
    "fano_burstiness_by_type",
    "t_closeness_audit",
    "attribution_position_based",
    # round-6 additions
    "multimodal_phash_neardup_real",
    "source_malformed_csv_permissive",
    "source_malformed_jsonl_permissive",
    "bitext_mine_margin",
    "bitext_mine_margin_ivf",
    "dedup_aware_split",
    "ann_ivf_persisted_topk",
    "multimodal_resize_real",
    "dsir_importance_resample",
    # round-9 additions
    "dedup_paragraph_minhash",
    "dedup_substring_containment",
    "contamination_matrix",
    "ivf_cosine_pairs_persisted",
    "quantization_recall_sweep",
    # round-10 additions (batch ops; the two streaming ingest twins
    # drain stores at plan time and are plan-pinned in tests instead)
    "dedup_paragraph_keep",
    "dedup_substring_keep",
    "ivf_cosine_pairs_compacted",
    "contamination_matrix_crosslingual",
    "dedup_keep_best_quality",
    "dedup_cdc_chunks",
    "dedup_cdc_keep",
    "ivf_cosine_pairs_incremental",
    "decontaminate_crosslingual",
    "dedup_containment_keep",
    "dedup_paragraph_keep_best",
    "dedup_crosslingual_keep",
    "ivf_cosine_pairs_erased",
    "ivf_cell_balance_audit",
    "ivf_retrain_recall_gain",
    "dedup_crosslingual_keep_best",
    "decontaminate_substring",
]


def main() -> None:
    spark = get_spark("plans-dump")
    specs = all_specs()
    out = [
        "# PLANS — formatted physical plans of the headline queries",
        "",
        "Generated by `python tools/dump_plans.py` at sf0.01. What to look",
        "for: `PushedFilters` on scans, pruned `ReadSchema`, BroadcastHashJoin",
        "on dimension joins, and the Exchange count per query (each Exchange",
        "is a shuffle — the dominant cost at 100 TB).",
        "",
    ]
    for name in PLAN_SET:
        df = specs[name].fn(spark, SF_DIR)
        out.append(f"## {name}\n")
        out.append("```")
        out.append(formatted_plan(df).rstrip())
        out.append("```\n")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(PLAN_SET)} plans)")


if __name__ == "__main__":
    main()
