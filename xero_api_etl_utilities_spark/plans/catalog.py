"""Central query/oracle catalog.

Each plans module contributes named (spark, sf_dir) -> DataFrame
builders plus their DuckDB oracle SQL. This module merges them into
the two dicts the driver contract (__spark_entry__.py) expects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xero_api_etl_utilities_spark.plans import flagship

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str | Callable[[], str]] = {}

# The driver's CORRECTNESS_r{N}.json records only the FIRST 50 entries of
# queries().  Registration order alone left the newest third of the catalog
# invisible to that hard signal (VERDICT r2, "What's missing" #1).  Names
# listed here are emitted first — newest / least-stable work belongs at the
# top; long-stable scalar packs and relational basics can live outside the
# window because many rounds of green driver rows already pin them.
# Names not yet registered are ignored, so new-round queries can be listed
# here before their module lands.
_WINDOW_PRIORITY: list[str] = [
    # r10 WINDOW (slots 1-50).  Composition, per the written r10
    # rotation plan (VERDICT r9 "Next round" item 1): (a) r9 had ZERO
    # reds, so the r10 wave's new registrations and behavior-changed
    # queries go first, (b) ALL 18 names whose newest driver row is
    # still r1/r2 (they fell below the r9 fold), (c) pad the window
    # with r3-green names that have had exactly one driver row ever —
    # load-bearing (TPC-H, dedup, CDC, embedding) first.  Unregistered
    # names are ignored, so planned-but-unlanded r10 queries can be
    # listed before their module lands.
    #
    # r11 ROTATION PLAN (write it while the context is fresh): (a)
    # any r10 reds to the TOP, (b) the r11 wave, (c) the ~30 r3-only
    # names that fell below this round's fold (the three displaced by
    # late-r10 registrations — multimodal_decode_features,
    # embedding_quantize_sq8, embedding_pq_codes — first, then
    # events_*, sample_*, text_normalize/pii/repetition/top_terms/
    # doc_frequency, agg_grouping_sets, agg_winsorized_revenue,
    # basket_part_pairs, fuzzy_name_match, join_skewed_salted,
    # profile_orders, similarity_topk_ivfpq/_pandas, unpivot_measures,
    # window_equidepth_bins, window_share_of_total,
    # events_cohort_retention, events_funnel, dedup ...), (d) pad
    # with the oldest r5 rows.
    # --- (a) r10 new registrations + r10 behavior changes ---
    "corr_all_quantified",
    "corr_not_in_null_trap",
    "corr_scalar_select_twice",
    "corr_nested_exists_scalar",
    "pipeline_corpus_publish",
    "decontaminate_span_emit",
    "similarity_topk_mips",
    "orders_rfm_migration",  # band-stats single-pass rework (r10)
    "orders_rfm_segments",  # quartiles fused into one tagged pass (r10)
    "text_span_dedup_emit",  # kept-text rebuild rework (r10)
    "multimodal_frame_sample",  # per-frame blob-copy hoist (r10)
    "part_abc_classification",  # rankdist guard touch, spot check
    # --- (b) ALL 18 r1/r2-stale names (zero the backlog) ---
    "filter_negation_membership_routing",
    "pivot_event_values",
    "set_ops_custkeys",
    "parts_brand_margin",
    "cluster_assign",
    "pipeline_corpus_clean",
    "sample_split_assign",
    "text_quality",
    "text_token_counts",
    "text_fingerprint",
    "text_lang_id",
    "events_sliding",
    "events_sessionization",
    "events_dedup_latest",
    "sort_limit_topk",
    "union_tagged_streams",
    "invoice_line_assembly",
    "filter_null_and_zero",
    # --- (c) r3-single-row names, load-bearing first (23 slots) ---
    "q4_priority_returns",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_bracketed_revenue",
    "q22_dormant_customers",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_verified_pairs",
    "dedup_cluster_sizes",
    "merge_cdc_snapshot",
    "snapshot_diff_summary",
    "multimodal_decode_features",
    "embedding_pq_codes",
    "embedding_quantize_sq8",
    # ------------------- below the driver's 50-row fold -------------------
    # r9 window names (all green r9; kept high for visibility)
    "orders_cohort_ltv",
    "dedup_minhash_calibration",
    "decontaminate_longest_run",
    "orders_rfm_segments",
    "agg_revenue_concentration",
    "part_pareto_frontier",
    "fuzzy_sorted_neighborhood",
    "multimodal_audio_vad",
    "daily_pnl_rollup",
    "diag_quality_deciles_dist",
    "text_zipf_slope",
    "feature_pit_scd2",
    "scan_project_filter",
    "reconcile_matched",
    "reconcile_unverified",
    "window_segmentation",
    "scalar_string_pack",
    "scalar_date_pack",
    "scalar_null_conditional_pack",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "agg_rollup",
    "agg_cube",
    "agg_percentiles",
    "agg_conditional_sums",
    "agg_string_receipts",
    "agg_balance_check",
    "agg_all_balanced",
    "join_asof",
    "join_exactly_one",
    "join_cardinality_violations",
    "join_range_intransit",
    "dim_join_enrich",
    "window_rank_topk",
    "window_lag_lead",
    "window_moving_frame",
    "events_tumbling",
    # r7/r8 window names (all green r8; kept high for visibility)
    "dedup_semantic_clusters",
    "sample_token_budget_plan",
    "graph_cc_star",
    "multimodal_ahash_pairs",
    "decontaminate_neardup",
    "dedup_cluster_representatives",
    "diag_ks_drift",
    "decontaminate_report",
    "diag_quality_deciles",
    "text_dup_span_coverage",
    "embedding_dim_health",
    "dedup_pair_provenance",
    "similarity_ivf_cell_balance",
    "dedup_savings_census",
    "corpus_mix_census",
    "similarity_label_purity",
    "text_head_coverage",
    "sample_pack_waste",
    "agg_approx_distinct_ok",
    "text_unigram_logprob",
    "text_winnow_fingerprints",
    "corpus_self_similarity",
    "split_balance_report",
    "embedding_label_centroid_sim",
    "sample_curriculum_order",
    "text_tf_cosine_pairs",
    "pipeline_curation_report",
    "join_interval_overlap",
    "label_noise_kappa",
    "tokenizer_oov_census",
    "text_char_entropy",
    "similarity_ivfpq_recall",
    "text_rake_keywords",
    "doc_chunk_overlap_census",
    "similarity_range_search",
    "layout_partition_advisor",
    "diag_langid_confusion",
    "diag_benford_firstdigit",
    "join_asof_nearest",
    "diag_functional_deps",
    "text_bigram_surprisal",
    "orders_yoy_growth",
    "text_source_tvd_matrix",
    # r6 window names (all green r6; kept high for visibility)
    "dedup_lsh_quality",
    "part_abc_classification",
    "orders_rfm_segments",
    "window_interval_coalesce",
    "events_bounce_rate",
    "agg_mad_outliers",
    "events_decayed_type_scores",
    "layout_zonemap_prune",
    "events_user_diversity",
    "events_daily_trend",
    "agg_value_variance_exact",
    "replica_bucket_diff",
    "text_hashing_features",
    "text_posting_lists",
    "diag_data_contract",
    "set_customer_segments",
    "window_distribution_ranks",
    "join_above_avg",
    "q21_suppliers_kept_waiting",
    "decontaminate_ngrams",
    "doc_pack_chunks",
    "sample_stratified",
    "split_leakage_safe",
    "text_top_terms_per_doc",
    "text_rarity",
    "events_json_props",
    "events_weekday_seasonality",
    "events_time_to_convert",
    "events_position_attribution",
    "events_burstiness",
    "agg_revenue_concentration",
    "events_stickiness",
    "part_pareto_frontier",
    "events_changepoint",
    "similarity_topk_ivfpq_dist",
    "similarity_topk_ivfpq_rerank",
    "events_daily_anomalies",
    "multimodal_video_meta",
    "events_pivot_daily",
    "events_user_accumulation",
    "merge_scd2_history",
    "diag_referential_integrity",
    "join_point_in_time",
    "text_gopher_rules",
    "text_bm25_topk",
    "events_seq_pairs",
    "diag_distribution_drift",
    "text_boilerplate_shingles",
    "sample_epoch_shuffle",
    # --- r4/r5 window (all green r4 or r5; kept high for regression
    # visibility) ---
    "graph_bfs_depth",
    "events_clamped_balance",
    "basket_brand_rules",
    "text_bpe_merges",
    "graph_label_propagation",
    "dedup_prefix_filter_pairs",
    "fuzzy_sorted_neighborhood",
    "basket_brand_triples",
    "layout_shard_moves",
    "graph_kcore",
    "pipeline_training_corpus",
    "agg_kmv_overlap",
    "diag_join_size_estimate",
    "nested_invoice_stats",
    "text_retrieve_rerank",
    "agg_kmv_distinct",
    "join_asof_tolerance",
    "events_session_window",
    "graph_pagerank",
    "events_trailing_7d_distinct_approx",
    "sample_negative_pairs",
    "events_trailing_7d_distinct",
    "diag_key_skew",
    "join_bloom_pruned",
    "layout_zorder_stats",
    "text_bigram_novelty",
    "graph_triangle_counts",
    "events_max_concurrency",
    "events_heavy_hitters_cms",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
    "multimodal_audio_features",
    "profile_orders_approx",
    "q12_shipmode_priority",
    # --- changed in round 4 (merge.py presence-marker rework;
    # WindowExec fix) ---
    "snapshot_diff_summary",
    "window_share_of_total",
    "merge_cdc_snapshot",
    "dedup_simhash",
    "dedup_simhash_pairs",
    # --- round-3 additions ---
    "events_trailing_7d",
    "agg_winsorized_revenue",
    "dedup_cluster_sizes",
    "events_daily_fill_forward",
    "events_transition_matrix",
    "multimodal_decode_features",
    "dedup_containment",
    "embedding_quantize_sq8",
    "sample_per_source_topk",
    "sample_mixture_rebalance",
    "events_interarrival",
    "window_equidepth_bins",
    "fuzzy_name_match",
    "events_first_touch_attribution",
    "sample_weighted_by_length",
    "events_top_paths",
    "profile_orders",
    "basket_part_pairs",
    "embedding_pq_codes",
    "similarity_topk_ivfpq",
    "q4_priority_returns",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_bracketed_revenue",
    "q22_dormant_customers",
    # --- heavier / sketch queries worth keeping under the driver's eye ---
    "pipeline_corpus_clean",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "join_skewed_salted",
    "similarity_topk_ivf",
    "cluster_assign",
    "agg_percentiles",
    "join_range_intransit",
]


def _window_ordered(d: dict) -> dict:
    """Priority names first (in listed order), then registration order."""
    head = {k: d[k] for k in _WINDOW_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def register(
    name: str, fn: QueryFn, oracle: str | Callable[[], str] | None = None
) -> None:
    """``oracle`` may be a SQL string or a zero-arg callable returning
    one — callables defer data-dependent oracle generation (e.g. the
    IVF oracle inlines centroids trained from the sf0.01 parquet) to
    ``oracle_sql()`` time, keeping ``queries()`` import cheap for
    consumers like bench that never read oracles."""
    if name in _QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


register("daily_pnl_rollup", flagship.daily_pnl_rollup, flagship.FLAGSHIP_ORACLE)


def _load_extra_modules() -> None:
    """Import catalog-contributing modules (they call register())."""
    from xero_api_etl_utilities_spark.plans import (  # noqa: F401
        relational,
        extensions,
        windows_extra,
        tpch_like,
        corpus_ops,
        analytics_extra,
        scale_ops,
        training_ops,
        cdc_ops,
        retrieval_quality,
        graph_ops,
        mining_ops,
        corpus_extra,
        corpus_wave7,
        wave9,
        wave10,
    )


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        _load_extra_modules()
        _loaded = True


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _window_ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    out: dict[str, str] = {}
    for name, o in _ORACLES.items():
        if callable(o):
            o = o()
            _ORACLES[name] = o  # cache the generated SQL
        out[name] = o
    return _window_ordered(out)
