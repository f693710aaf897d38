"""Driver-window staging chunk (r14 module-budget split — VERDICT r13
#2: catalog.py sat at 2499/2500 lines, so the round-12+ registrations
and driver-window orderings moved HERE before the next addition forced
a rushed split).  catalog.py calls :func:`stage` after the round-11
ordering and re-exports every ``_R*`` staging name into its own
namespace, so law tests keep their historical import path
(``catalog._R13_FRONT`` etc. — the mg_store re-export precedent).

The staging lists are FROZEN literals: each round's window is an
auditable record of what the driver was asked to sample and why, and
the asserts re-verify the invariants (50-entry window, no overlap,
every name registered) on every import.
"""

from __future__ import annotations


def stage(CATALOG: dict, _R11_NEXT: list[str]) -> dict:
    """Apply the round-12+ registrations and driver-window orderings to
    the catalog built through round 11, publish the ``_R*`` staging
    names as module attributes, and return the re-ordered catalog.
    ``_R11_NEXT`` is passed in explicitly (not re-imported) because
    catalog.py calls this mid-initialization."""
    # -------------------------------------------------------------- #
    # round-12 registrations (builders AND specs in catalog_r12.py —
    # the chunk convention)
    # -------------------------------------------------------------- #
    _r12 = __import__("big_data_table_spark.catalog_r12", fromlist=["x"]).r12_specs()
    CATALOG.update(_r12)

    # -------------------------------------------------------------- #
    # driver-window ordering (round 12) — VERDICT r11 #1: the 8 entries
    # of _R11_NEXT (the r11 lifecycle family) are the only ones the
    # driver has never seen; they fit one window with 42 slots spare,
    # filled with the stalest-evidence refreshes — the r5-window
    # entries whose latest green driver row is still round 5
    # (CORRECTNESS_r05 keys minus every later round), taken in catalog
    # order.  47 such entries exist, so 42 head the window and the
    # remaining 5 spill to _R12_NEXT ahead of the new r12 entries.
    # After this window, no entry's newest driver evidence predates
    # round 6.
    # -------------------------------------------------------------- #
    _R5_STALE = [
        "multimodal_wav_decode", "multimodal_png_decode", "sequence_packing",
        "bloom_membership_audience", "cms_heavy_hitters", "q1_pricing_summary",
        "q6_revenue", "join3_revenue_by_segment", "filter_project", "topk_orders",
        "lookup_join_nation_region", "semi_join_orders", "anti_join_customers",
        "cross_join_region_nation", "grouped_sum_by_year", "group_count",
        "grouped_mean", "agg_all_sd", "multi_key_group", "keyby_sorted",
        "distinct_segments", "count_distinct", "union_all_counts",
        "intersect_custkeys", "except_custkeys", "window_topk_per_group",
        "window_running_sum", "window_lag_lead", "rollup_agg", "cube_agg",
        "grouping_sets", "pivot_linestatus", "two_phase_agg", "merge_upsert",
        "percentile_exact", "part_brand_stats", "supplier_chain",
        "sample_by_hash", "train_val_test_split", "generator_source",
        "csv_roundtrip", "json_roundtrip", "balanced_sample_per_group",
        "clean_corpus_pipeline", "string_functions", "array_functions",
        "weighted_sample_topk",
    ]
    _R12_FRONT = _R11_NEXT + _R5_STALE[:42]
    _R12_NEW = list(_r12)
    _R12_NEXT = _R5_STALE[42:] + _R12_NEW

    assert len(_R12_FRONT) == len(set(_R12_FRONT)) == 50, len(_R12_FRONT)
    assert set(_R12_FRONT + _R12_NEXT) <= set(CATALOG), sorted(
        set(_R12_FRONT + _R12_NEXT) - set(CATALOG)
    )
    assert not set(_R12_FRONT) & set(_R12_NEXT)

    # _head12 enumerates every catalog key (window head + the rest), so
    # rebuilding from it alone is complete
    _head12 = _R12_FRONT + _R12_NEXT + [
        n for n in CATALOG if n not in set(_R12_FRONT + _R12_NEXT)
    ]
    CATALOG = {name: CATALOG[name] for name in _head12}

    # -------------------------------------------------------------- #
    # round-13 registrations (builders AND specs in catalog_r13.py —
    # the chunk convention)
    # -------------------------------------------------------------- #
    _r13 = __import__("big_data_table_spark.catalog_r13", fromlist=["x"]).r13_specs()
    CATALOG.update(_r13)

    # -------------------------------------------------------------- #
    # driver-window ordering (round 13) — VERDICT r12 #2: _R12_NEXT's
    # 12 entries are the only ones without a driver row (7 r12-new) or
    # whose newest row is round 5 (5 spill-overs); the 3 NEW r13
    # entries follow (VERDICT #1 wants rollup_day_retention
    # driver-green THIS round); the 35 remaining slots take the stalest
    # evidence — the r6-window entries whose latest green driver row is
    # round 6 (CORRECTNESS_r06 keys minus every later round), in
    # catalog order.  50 such entries exist, so 35 head the window and
    # 15 spill to _R13_NEXT.
    # -------------------------------------------------------------- #
    _R6_STALE = [
        "theta_sketch_intersection", "mg_heavy_hitters", "stream_hll_cardinality",
        "sequence_packing_by_lang", "hll_daily_rollup_range", "hll_rollup_persisted",
        "theta_overlap_by_source", "text_token_count_subword", "sequence_packing_subword",
        "q2_min_cost_supplier", "q5_local_supplier_volume", "q7_volume_shipping",
        "q8_market_share", "q9_product_type_profit", "q10_returned_items",
        "q11_important_stock", "q12_late_shipment_priority", "q13_customer_distribution",
        "q15_top_supplier", "q16_parts_supplier_relationship",
        "q17_small_quantity_revenue", "q19_disjunctive_revenue",
        "q20_potential_promotion", "q21_suppliers_kept_waiting",
        "q22_sales_opportunity", "stream_dedup_counts", "stream_dedup_watermark",
        "stream_stateful_counts", "stream_static_enrich", "quantile_sketch_grouped",
        "tdigest_quantiles_grouped", "grouped_correlation", "cohort_retention",
        "events_dau_wau", "events_audience_overlap", "vocab_growth_curve",
        "corpus_source_mix", "decontamination_report", "dedup_crosslingual_pairs",
        "dedup_rate_trend", "incremental_dedup", "embedding_label_centroids",
        "embedding_pca_power", "ann_ivf_trained_topk", "ann_pq_topk",
        "ann_pq_trained_topk", "text_bigram_cross_entropy", "text_lang_id_confusion",
        "text_repetition_ratio", "tfidf_top_terms",
    ]
    _R13_NEW = list(_r13)
    _R13_FRONT = _R12_NEXT + _R13_NEW + _R6_STALE[: 50 - 12 - len(_R13_NEW)]
    _R13_NEXT = _R6_STALE[50 - 12 - len(_R13_NEW):]

    assert len(_R13_FRONT) == len(set(_R13_FRONT)) == 50, len(_R13_FRONT)
    assert set(_R13_FRONT + _R13_NEXT) <= set(CATALOG), sorted(
        set(_R13_FRONT + _R13_NEXT) - set(CATALOG)
    )
    assert not set(_R13_FRONT) & set(_R13_NEXT)

    # _head13 enumerates every catalog key (window head + the rest), so
    # rebuilding from it alone is complete
    _head13 = _R13_FRONT + _R13_NEXT + [
        n for n in CATALOG if n not in set(_R13_FRONT + _R13_NEXT)
    ]
    CATALOG = {name: CATALOG[name] for name in _head13}

    # -------------------------------------------------------------- #
    # round-14 registrations (builders AND specs in catalog_r14.py —
    # the chunk convention)
    # -------------------------------------------------------------- #
    _r14 = __import__("big_data_table_spark.catalog_r14", fromlist=["x"]).r14_specs()
    CATALOG.update(_r14)

    # -------------------------------------------------------------- #
    # driver-window ordering (round 14) — VERDICT r13 #1: the window is
    # EXACTLY as prescribed — _R13_NEXT (15, the only entries whose
    # newest driver row predates round 7) + the 35 stalest r7-window
    # entries (CORRECTNESS_r07 keys minus every later round — all 50 of
    # the r7 window, none re-sampled since), in catalog order; the
    # remaining 15 spill to _R14_NEXT, and the NEW r14 entry follows
    # them there (the r12 precedent: new entries take their driver row
    # the round after their pytest round).  After this window lands, no
    # entry's driver evidence predates round 8.
    # -------------------------------------------------------------- #
    _R7_STALE = [
        "hll_rollup_incremental", "hll_rolling_7day", "stream_hll_daily",
        "cms_heavy_hitters_by_type", "source_mixture_weights", "mixture_resample",
        "pii_scrub_audit", "dedup_chunk_passages", "pandas_udaf_quantiles",
        "sample_fixed_k", "stratified_sample", "weighted_sample_per_group",
        "split_balance_report", "partials_diag", "approx_distinct_diag",
        "hll_rollup_compacted", "mixture_resample_epochs", "theta_rolling_churn",
        "ann_ivf_persisted_topk", "incremental_dedup_persisted", "orders_by_month",
        "multimodal_features", "multimodal_resize_meta", "events_json_extract",
        "events_asof_forward", "stream_sliding_10x5", "stream_session_30min",
        "events_tumbling_5min", "events_sessionize", "events_asof_purchase",
        "stream_tumbling_5min", "stream_click_purchase_join",
        "events_anomaly_zscore", "dedup_pipeline_summary", "dedup_exact",
        "dedup_minhash_signature", "dedup_minhash_lsh_pairs", "dedup_components",
        "dedup_simhash", "dedup_simhash_candidates", "dedup_ngram_jaccard",
        "text_winnow_fingerprint", "text_token_count", "text_lang_id",
        "text_quality_score", "text_fingerprint", "embedding_neardup",
        "ann_topk_cosine", "ann_lsh_pairs", "ann_ivf_topk",
    ]
    _R14_NEW = list(_r14)
    _R14_FRONT = _R13_NEXT + _R7_STALE[:35]
    _R14_NEXT = _R7_STALE[35:] + _R14_NEW

    assert len(_R14_FRONT) == len(set(_R14_FRONT)) == 50, len(_R14_FRONT)
    assert set(_R14_FRONT + _R14_NEXT) <= set(CATALOG), sorted(
        set(_R14_FRONT + _R14_NEXT) - set(CATALOG)
    )
    assert not set(_R14_FRONT) & set(_R14_NEXT)

    # _head14 enumerates every catalog key (window head + the rest), so
    # rebuilding from it alone is complete
    _head14 = _R14_FRONT + _R14_NEXT + [
        n for n in CATALOG if n not in set(_R14_FRONT + _R14_NEXT)
    ]
    CATALOG = {name: CATALOG[name] for name in _head14}

    # -------------------------------------------------------------- #
    # round-15 registrations (builders AND specs in catalog_r15.py —
    # the chunk convention)
    # -------------------------------------------------------------- #
    _r15 = __import__("big_data_table_spark.catalog_r15", fromlist=["x"]).r15_specs()
    CATALOG.update(_r15)

    # -------------------------------------------------------------- #
    # driver-window ordering (round 15) — VERDICT r14 #1: the window is
    # EXACTLY as prescribed — _R14_NEXT (16: the 15 entries whose
    # newest driver row is round 7 plus `multimodal_jpeg_progressive`,
    # which has no driver row yet) + the 34 stalest r8-window entries
    # (CORRECTNESS_r08 keys minus every later round — 50 such entries
    # exist, none re-sampled since), in catalog order; the remaining 16
    # spill to _R15_NEXT, and the NEW r15 entries (PNG color types,
    # 12-bit JPEG) follow them there (the r12 precedent: new entries
    # take their driver row the round after their pytest round).  After
    # this window lands, no entry's driver evidence predates round 9.
    # -------------------------------------------------------------- #
    _R8_STALE = [
        "cms_rolling_heavy_hitters", "ann_pq_persisted_topk", "corpus_filter_cascade",
        "tdigest_rollup_range", "tdigest_rollup_compacted", "tdigest_rolling_quantiles",
        "bloom_index_persisted", "training_order_shuffle", "corpus_data_card",
        "stream_cms_heavy_hitters", "stream_tdigest_daily", "ann_ivfpq_topk",
        "dedup_keep_best_quality", "stream_bloom_seen_index", "source_overlap_matrix",
        "embedding_drift_by_label", "packing_boundaries", "quality_decile_curve",
        "table_profile", "dedup_containment_pairs", "winnow_attribution",
        "events_asof_tolerance", "tdigest_rollup_grouped_range",
        "hll_rollup_grouped_range", "bloom_rolling_membership",
        "ann_ivfpq_residual_topk", "ann_ivfpq_persisted_topk",
        "curriculum_serving_order", "tokenizer_fertility", "dedup_substring_fraction",
        "theta_rollup_persisted", "hll_monthly_from_daily", "stream_packing_ledger",
        "theta_rollup_grouped_range", "dedup_substring_scrub",
        "curriculum_packed_batches", "ann_recall_report", "embedding_threshold_curve",
        "dedup_lsh_recall_report", "mixture_token_plan", "window_rank_family",
        "parts_abc_analysis", "events_rfm_segments", "packing_efficiency_curve",
        "shipping_delay_profile", "customer_order_gaps", "events_top_paths",
        "events_markov_transitions", "events_ewma_daily", "grouped_mad_outliers",
    ]
    _R15_NEW = list(_r15)
    _R15_FRONT = _R14_NEXT + _R8_STALE[:34]
    _R15_NEXT = _R8_STALE[34:] + _R15_NEW

    assert len(_R15_FRONT) == len(set(_R15_FRONT)) == 50, len(_R15_FRONT)
    assert set(_R15_FRONT + _R15_NEXT) <= set(CATALOG), sorted(
        set(_R15_FRONT + _R15_NEXT) - set(CATALOG)
    )
    assert not set(_R15_FRONT) & set(_R15_NEXT)

    # _head15 enumerates every catalog key (window head + the rest), so
    # rebuilding from it alone is complete
    _head15 = _R15_FRONT + _R15_NEXT + [
        n for n in CATALOG if n not in set(_R15_FRONT + _R15_NEXT)
    ]
    CATALOG = {name: CATALOG[name] for name in _head15}

    # publish the staging names for catalog.py to re-export (law tests
    # import them through big_data_table_spark.catalog, the historical
    # path)
    globals().update(
        {k: v for k, v in locals().items() if k.startswith("_R")}
    )
    return CATALOG
