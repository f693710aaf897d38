"""Shuffle-budget regression gate: every core catalog query's physical
plan must stay within its recorded exchange budget.  A new Exchange in
one of these plans is a 100 TB regression even when results stay correct
— this test makes it a visible failure."""

from __future__ import annotations

import pytest

from big_data_table_spark.catalog import CATALOG
from big_data_table_spark.plans import exchange_count

# name -> max shuffle exchanges allowed in the plan
BUDGET = {
    "q1_pricing_summary": 1,     # partial->final agg
    "q6_revenue": 1,             # single global agg
    "grouped_sum_by_year": 1,
    "group_count": 1,
    "multi_key_group": 1,
    "filter_project": 0,         # pure scan+filter+project
    "topk_orders": 0,            # TakeOrderedAndProject
    "lookup_join_nation_region": 0,  # broadcast join only
    "supplier_chain": 1,         # two broadcasts + one agg exchange
    "join3_revenue_by_segment": 4,   # fact-fact SMJ (2) + agg; AQE may add
    "events_tumbling_5min": 1,
    "events_sessionize": 2,      # window shuffle + agg
    "events_asof_purchase": 2,   # union window + (agg-free) output
    "merge_upsert": 3,           # anti join + agg
    "sample_by_hash": 2,       # countDistinct = 2-phase distinct agg
    "train_val_test_split": 1,
    # TPC-H batch 4 (tpch.py): dims broadcast at fixture scale, so the
    # budget is the aggregation cascade alone — a join exchange creeping
    # in means a broadcast regressed to a shuffle join
    "q5_local_supplier_volume": 1,
    "q7_volume_shipping": 1,
    "q8_market_share": 1,
    "q10_returned_items": 1,   # agg; top-20 is TakeOrderedAndProject
    "q12_late_shipment_priority": 1,
    "q13_customer_distribution": 2,  # two cascaded aggs
    "q15_top_supplier": 3,     # revenue agg + 1-row MAX + reuse
    "q17_small_quantity_revenue": 2,  # per-part avg + global agg
    "q19_disjunctive_revenue": 1,
    "q21_suppliers_kept_waiting": 1,  # semi/anti broadcast + agg
    "q22_sales_opportunity": 2,  # 1-row scalar avg + final agg
    # TPC-H batch 5 (derived partsupp): every budget includes the one
    # partsupp-derivation agg exchange on top of the query's own cascade
    "q2_min_cost_supplier": 3,   # partsupp + per-part MIN + reuse
    "q9_product_type_profit": 2,  # partsupp + profit agg (dims broadcast)
    "q11_important_stock": 5,    # partsupp + per-part agg + 1-row total + reuse
    "q16_parts_supplier_relationship": 3,  # partsupp + 2-phase count-distinct
    "q20_potential_promotion": 2,  # partsupp + shipped-qty agg
    # late-r2 analytics/pipeline ops (measured; AQE converts the small
    # sides to broadcasts at runtime — these pin the static shape)
    "grouped_correlation": 1,    # single moments aggregate
    "tdigest_quantiles_grouped": 2,  # centroid shuffle + rank-check agg
    "dedup_rate_trend": 3,       # crawl join + keepers + trend agg
    "vocab_growth_curve": 5,
    "events_dau_wau": 6,
    "cohort_retention": 6,
    "tfidf_top_terms": 7,
    "split_balance_report": 7,
    "decontamination_report": 7,
    "events_audience_overlap": 7,
    "incremental_dedup": 10,     # single-statement SQL recomputes the
                                 # band CTE per reference; production
                                 # persists the corpus band index
    # round 5
    "multimodal_wav_decode": 0,  # synth + decode are map-only mapInPandas
    "multimodal_png_decode": 0,  # synth + decode are map-only mapInPandas
    "bloom_membership_audience": 5,  # build distinct + probe distinct +
                                 # pos probe agg + member join + final agg
                                 # (set-bit sides broadcast at runtime)
    "cms_heavy_hitters": 6,      # sketch agg + exact agg + top-k + probe
                                 # agg + joins (sketch side broadcast)
    "theta_sketch_intersection": 4,  # final assembly over checkpointed
                                 # ≤k-row samples (sample build pays its
                                 # own exchanges once, before checkpoint)
    "mg_heavy_hitters": 3,       # candidate distinct + recount agg +
                                 # the r10 exactness-guard count pass;
                                 # top-k is TakeOrderedAndProject
    "hll_daily_rollup_range": 6, # assembly over the checkpointed daily
                                 # rollup + exact-audit distinct (which a
                                 # production range query would skip)
    "sequence_packing": 4,       # bucket window + totals agg + 256-row
                                 # offset window + final bin agg
    "sequence_packing_by_lang": 4,  # same shape, every window partitioned
    # round 6
    "partials_diag": 1,          # explicit-shard partial agg (one
                                 # partial->final exchange)
    "approx_distinct_diag": 2,   # exact countDistinct expand (2-phase)
                                 # + HLL++ merge ride along
    "hll_rollup_persisted": 4,   # range read of the persisted sketch
                                 # table: register MAX-merge + n_days
                                 # distinct + 1-row assembly; the build
                                 # pays its own single agg at write time
    "theta_overlap_by_source": 3,  # pair assembly over checkpointed
                                 # ≤k-row per-group samples
    "text_token_count_subword": 1,  # doc-words join + per-doc agg; the
                                 # walk's per-round joins are paid
                                 # before its checkpoints
    "sequence_packing_subword": 6,  # packing's 4 + subword-count join
                                 # + per-doc count agg
    # round 6, breadth batch (streaming stream_hll_daily excluded like
    # the other foreachBatch entries — counting its plan runs the query)
    "hll_rollup_incremental": 4,  # same range-read shape as persisted
    "cms_heavy_hitters_by_type": 7,  # grouped sketch + exact + rank
                                 # window + probe joins
    "source_mixture_weights": 3,  # per-source agg + scalar denominator
    "pii_scrub_audit": 1,        # one grouped aggregate over the scan
    "dedup_chunk_passages": 4,   # chunk digest agg + per-source
                                 # distinct agg + over-grid audit agg
                                 # (r7: the n_docs_over_grid guard column)
    "hll_rolling_7day": 4,       # daily register agg + window fan-out
                                 # merge + estimate agg (+ days grid) —
                                 # every exchange carries register rows,
                                 # never events
    "mixture_resample": 5,       # weights agg + scalar denom + source
                                 # rank window + pick join + audit agg
    # round 7
    "hll_rollup_compacted": 4,   # same range-read shape as persisted —
                                 # compaction happens before the
                                 # returned plan, which reads only the
                                 # compacted store
    "mixture_resample_epochs": 10,  # corpus-scale: source agg + rank
                                 # window + final agg (3); the other 7
                                 # carry <=20-row weight/epoch metadata
                                 # (scalar denominators, epoch grid)
    "theta_rolling_churn": 6,    # pair assembly over checkpointed
                                 # weeks*k sample tables (same shape as
                                 # theta_overlap_by_source + the exact
                                 # audit joins)
    "ann_ivf_persisted_topk": 3,  # probe window + rank window over the
                                 # DPP-pruned index scan — training
                                 # exchanges are gone from the query
                                 # path entirely
    "incremental_dedup_persisted": 7,  # batch signature agg + band
                                 # explode + digest/bucket membership
                                 # joins + first-copy agg — all batch-
                                 # or index-sized, never corpus text
    "cms_rolling_heavy_hitters": 5,  # weekly sketch agg + rolled SUM +
                                 # window exact agg + top rank + probe
                                 # agg over checkpointed hash/sketch
                                 # tables (the SQL form re-inlines to
                                 # 20 — why the DataFrame form exists)
    "ann_pq_persisted_topk": 4,  # ADC agg + rank window over the code
                                 # store; training exchanges gone from
                                 # the query path
    "corpus_filter_cascade": 10,  # per-doc feature aggs (shingle
                                 # repeat, lang, quality) joined on
                                 # doc_id + the per-source share window
                                 # — every exchange is doc-keyed
                                 # feature rows, never text twice
    "tdigest_rollup_range": 8,   # digest merge over the pruned store +
                                 # the rank AUDIT's rescan aggs (the
                                 # audit is the oracle hook, dropped in
                                 # production where only the store-read
                                 # merge remains)
    "tdigest_rollup_compacted": 5,  # store-read digest merge + weight
                                 # sum + the rank-audit rescan aggs;
                                 # build/append/compact run eagerly
                                 # before the query plan exists
    "bloom_index_persisted": 5,  # probe-side key distinct + per-key
                                 # hit/total aggs + the exact-membership
                                 # audit join; the store side is a
                                 # broadcast ≤m-row scan, no shuffle of
                                 # the batch
    "training_order_shuffle": 3,  # in-bucket rank window + ≤256-row
                                 # bucket-total agg + broadcast offset
                                 # join — the global sort the oracle's
                                 # ROW_NUMBER implies never happens
    "corpus_data_card": 5,       # per-doc feature aggs (shingle repeat,
                                 # digest distinct) joined on doc_id +
                                 # one per-source rollup — every
                                 # exchange carries doc-keyed numbers
                                 # or digests, never text twice
    "tdigest_rolling_quantiles": 8,  # day->window digest fan-out +
                                 # per-window merge + the rank-audit
                                 # range join over raw values (the
                                 # audit is the oracle hook; production
                                 # keeps only the store-side fan-out)
    "dedup_keep_best_quality": 2,  # per-component rank window + the
                                 # keeper join; CC labels come from the
                                 # checkpointed iterative propagation
    "source_overlap_matrix": 5,  # triangle self-join + sizes over the
                                 # ONE checkpointed (source, shingle)
                                 # set (the SQL text re-inlines to 19 —
                                 # why the DataFrame form exists)
    "embedding_drift_by_label": 4,  # (label, half, dim) partial-sum agg
                                 # + cross-half join + count agg — never
                                 # raw vectors twice
    "packing_boundaries": 4,     # packing's in-bucket window + offset
                                 # table + broadcast join + the per-bin
                                 # boundary aggregate
    "quality_decile_curve": 9,   # cascade feature aggs/joins + the
                                 # two-phase rank (band window + ≤21-row
                                 # offset/total broadcasts) + decile agg
    "table_profile": 2,          # ONE wide aggregate (expand for the
                                 # exact distincts) + stack unpivot of
                                 # the single stats row
    "dedup_containment_pairs": 3,  # pair×shingle join + per-pair count
                                 # over the checkpointed band table and
                                 # shingle set; sizes broadcast back
    "winnow_attribution": 5,     # attribution join + best-rank window
                                 # + per-doc aggs over the checkpointed
                                 # batch fingerprints and store (12
                                 # exchanges before the store was
                                 # checkpointed once for its 3 readers)
    "events_asof_tolerance": 2,  # identical to the base as-of (union +
                                 # one window exchange): the gap cap is
                                 # a pure projection over the carried
                                 # right row's own timestamp
    "tdigest_rollup_grouped_range": 3,  # per-group store merge + weight
                                 # sum + the rank-audit rescan agg —
                                 # grouping multiplies digest rows,
                                 # never merge width
    "hll_rollup_grouped_range": 4,  # per-group register MAX-merge +
                                 # estimate + day-count agg over the
                                 # pruned store scan — no events scan
                                 # on the range path
    "bloom_rolling_membership": 15,  # audit assembly over CHECKPOINTED
                                 # day-position/window/probe tables:
                                 # every exchange carries keys×windows
                                 # (~hundreds) or (we, v) audit rows —
                                 # the m-row position sets never
                                 # re-shuffle
    "ann_ivfpq_residual_topk": 6,  # probe window + residual dtab +
                                 # code join + ADC agg + rank over the
                                 # CHECKPOINTED trained cells/codebook/
                                 # codes — no Lloyd on the query path
    "curriculum_serving_order": 4,  # docs join + two-phase rank +
                                 # per-(source, epoch) agg over the
                                 # checkpointed pick multiset (18
                                 # exchanges before the checkpoint —
                                 # the scalar-subquery inlining trap)
    "ann_ivfpq_persisted_topk": 4,  # probe window + residual dtab +
                                 # ADC agg + rank — all over store
                                 # scans; neither Lloyd chain on the
                                 # query path (plan-pinned)
    "tokenizer_fertility": 2,    # doc-words join + per-lang agg over
                                 # the checkpointed word-type counts
                                 # (the walk pays its exchanges before
                                 # its checkpoints)
    "dedup_substring_fraction": 7,  # gram digest agg + shared-gram
                                 # join + per-doc run window/agg +
                                 # doclen join + per-source agg — only
                                 # SPARSE shared-start rows cross the
                                 # window pass, never a per-position
                                 # table
    "theta_rollup_persisted": 10,  # estimator assembly (theta agg +
                                 # 1-row min + kept-distinct + n_days)
                                 # over the CHECKPOINTED days·k store
                                 # read + the exact-audit distinct a
                                 # production range query would skip;
                                 # build/append/compact run before the
                                 # returned plan exists
    "theta_rollup_grouped_range": 10,  # same assembly per group over
                                 # the checkpointed groups·days·k store
                                 # read + the per-group exact audit —
                                 # grouping widens rows, not the merge
    "dedup_substring_scrub": 6,  # gram digest/owner agg + non-owner
                                 # hit join + coverage join/window +
                                 # per-doc rebuild agg — the dense
                                 # position explode is map-side; only
                                 # (doc, pos) pairs shuffle
    "curriculum_packed_batches": 5,  # draws join + packing's in-bucket
                                 # window/offset pair + per-bin agg
                                 # over the checkpointed pick multiset
                                 # — the oracle's global-window cumsum
                                 # never appears
    "ann_recall_report": 17,     # the evaluation job: BOTH search arms
                                 # (IVF probe chain + the exact arm's
                                 # corpus scan) + the full-join recall
                                 # agg — production runs this on a
                                 # sampled query set, and the exact arm
                                 # is the cost the sample bounds
    "dedup_lsh_recall_report": 4,  # pair join + threshold fan-out agg
                                 # over the CHECKPOINTED truth/band/
                                 # candidate tables (each computed
                                 # once; the single-statement form
                                 # re-inlines the signature chain)
    "mixture_token_plan": 5,     # per-source agg + the two scalar
                                 # denominator subqueries Spark inlines
                                 # (≤20-row weight tables)
    "window_rank_family": 2,     # one partitioned window pass + the
                                 # quartile summary agg
    "events_top_paths": 3,       # user-partitioned window cascade +
                                 # path agg + top-path agg; top-15 is
                                 # TakeOrderedAndProject
    "events_markov_transitions": 3,  # sessionize cascade + pair agg +
                                 # the probability window over the
                                 # <=|types|^2 transition table
    "dedup_cascade": 4,          # stage joins + rollup agg + share
                                 # window over the CHECKPOINTED
                                 # substring per-doc and band tables
                                 # (SQL text re-inlines to 27)
    "embedding_threshold_curve": 5,  # threshold fan-out + pair/doc
                                 # aggs over the CHECKPOINTED all-pairs
                                 # cosine table — the sample-exact
                                 # calibration job
    "parts_abc_analysis": 4,     # banded in-band cumsum window +
                                 # <=256-row offset window + class agg
                                 # over the checkpointed per-part
                                 # revenue — the oracle's global-sort
                                 # window never appears
    "events_ewma_daily": 2,      # daily agg + the bounded <=31-day
                                 # pair-join accumulate
    "grouped_mad_outliers": 6,   # three grouped exact-percentile aggs
                                 # (2-phase each) with the <=|types|-row
                                 # median tables broadcast back
    "hll_monthly_from_daily": 4, # month-prefix register MAX-merge +
                                 # estimate + day-count agg over the
                                 # store scan — no events scan on the
                                 # hierarchy path
    "packing_efficiency_curve": 20,  # four independent two-phase
                                 # packing passes (5 exchanges each)
                                 # unioned — each budget is its own
                                 # standard layout, run once
    "shipping_delay_profile": 2, # orders broadcast onto lineitem +
                                 # the percentile agg (one exchange at
                                 # fixture scale; headroom for the
                                 # co-partitioned join at 100 TB)
    "customer_order_gaps": 2,    # customer broadcast + per-customer
                                 # LAG window + segment percentile agg
    "events_rfm_segments": 15,   # three chained two-phase rank scans
                                 # (window + band agg + offset join
                                 # each) + the cell agg — ALL over the
                                 # checkpointed users-sized table, the
                                 # oracle's three global sorts never
                                 # appear
    "quality_dedup_interaction": 8,  # cascade feature aggs/joins + the
                                 # crosstab agg over the CHECKPOINTED
                                 # band/candidate tables (SQL text
                                 # re-inlines to 40)
    # r8: persisted CMS store reads — the counter SUM-merge AND the
    # exact top-k probe are both checkpointed, so the measured plan is
    # the single probe-join estimate aggregate; the store
    # build/append/compact verbs run as side jobs before the query
    "cms_rollup_persisted": 1,
    "cms_rollup_grouped_range": 2,
    "orders_market_basket": 5,   # pair agg on the checkpointed item
                                 # table + part counts + top-20 probe
                                 # joins (top side broadcast)
    "orders_backlog_profile": 2, # delta agg + month agg; the running
                                 # sum windows the calendar-bounded
                                 # delta table off the checkpointed
                                 # interval join
    "customer_ltv_cohort": 3,    # first-order agg + cohort join +
                                 # cohort agg
    "events_attribution_last_touch": 2,  # per-user window + final agg
    "events_funnel_windowed": 6, # two user-partitioned window passes
                                 # (view->click, click->purchase) +
                                 # three distinct-user count aggs off
                                 # the checkpointed qualified clicks
    "minhash_estimate_report": 3,  # candidate join + truth left join +
                                 # agreement agg over CHECKPOINTED
                                 # sigs/bands/truth
    "corpus_burstiness": 5,      # per-doc term agg + moment agg +
                                 # top-10 + scalar n
    "vocab_oov_curve": 7,        # train freq agg + two-phase rank
                                 # (in-bucket window + offset) + test
                                 # agg + size-grid agg, all off the
                                 # checkpointed token table
    "decontamination_curve": 24, # three INDEPENDENT width blocks (a
                                 # DataFrame union, never a re-inlined
                                 # shared CTE), 8 exchanges each:
                                 # shingle distinct + source join +
                                 # eval distinct + probe join + per-doc
                                 # agg + rollup
    "embedding_norm_outliers": 3,  # three grouped aggs (median, MAD,
                                 # outlier count) with broadcast-back
                                 # median tables over the CHECKPOINTED
                                 # norm/deviation frames
    "embedding_pq_distortion": 5,  # assign rank window + distortion agg
                                 # (the ann_pq CTE chain, report form)
    "events_user_gini": 2,       # per-user count agg + Gini agg over
                                 # the CHECKPOINTED two-phase rank
    "text_zipf_fit": 8,          # term freq agg + two-phase rank
                                 # (in-bucket window + offset) + moment
                                 # agg — no global sort anywhere
    "doc_length_histogram": 1,   # single grouped agg (digit bucket is
                                 # a projection)
    "source_kl_drift": 2,        # half-count agg + the KL-term sum over
                                 # the |sources|-row table
    "lang_id_calibration": 1,    # scorer is a projection; one band agg
    "events_bounce_rate": 2,     # user-partitioned session windows +
                                 # session agg (entry-type rollup rides
                                 # the same exchange)
    "conversion_latency_profile": 2,  # per-user first-event agg +
                                 # profile agg
    "supplier_concentration_hhi": 4,  # revenue agg + type totals +
                                 # share join + HHI rollup (part dim
                                 # broadcasts at fixture scale)
    "dup_cluster_histogram": 3,  # content-hash agg + histogram agg +
                                 # scalar corpus size
    "brand_return_rate_wilson": 1,  # one grouped agg (part broadcasts);
                                 # the Wilson bound is a projection
    "shingle_df_profile": 2,     # DF agg (checkpointed; the SQL text's
                                 # scalar subquery re-inlines it to 8)
                                 # + histogram agg
    "embedding_centroid_margin": 1,  # the per-label top-1 rank window
                                 # — the pair-dot agg is paid before
                                 # its checkpoint, and norms/cos ride
                                 # the tiny checkpointed tables
    # round 9 — sessionize/entropy/calibration batch.  The entropy
    # entries' exchanges all ride their CHECKPOINTED bounded frames
    # (≤ |types|² / sources×langs / months rows); the expensive
    # pre-checkpoint stage is paid exactly once.
    "events_peak_concurrency": 4,    # cell-count agg before checkpoint;
                                 # day-max + witness join after
    "events_interarrival_profile": 2,  # per-user lag window + type agg
    "events_transition_entropy": 7,  # all over the ≤25-row pair frame
    "source_lang_entropy": 7,        # all over the sources×langs frame
    "orders_seasonality_index": 4,   # months-grain frame + 2 scalar
                                 # subqueries over the checkpoint
    "customer_spend_migration": 3,   # two half aggs + customer join
    "source_token_diversity": 4,     # token explode + 2-phase distinct
                                 # + docs agg + join
    "boilerplate_ngram_top": 3,      # shingle agg (distinct doc_id);
                                 # top-20 is TakeOrderedAndProject
    "simhash_hamming_histogram": 2,  # band self-join + 17-row histogram
                                 # over the checkpointed signatures
    "embedding_anisotropy_report": 4,  # bucket self-join + bin agg +
                                 # bounded 20-row share window
    "mg_rollup_persisted": 4,    # exact-audit agg + store summary agg
                                 # + TakeOrdered merge; the build/verb
                                 # shuffles are paid into the store
    "mg_rollup_grouped_range": 10,  # per-group assembly over the
                                 # checkpointed store read + the exact
                                 # audit agg (theta grouped's shape)
    "events_retention_curve": 6,  # distinct user-day pass + first-day
                                 # agg (both checkpointed) + cohort
                                 # aggregates over user-grain frames
    "dedup_ngram_jaccard": 5,    # verifier DF form: filtered shingles
                                 # checkpointed once (was 32 flat)
    "neardup_source_matrix": 7,  # rides the checkpointed verifier DF
                                 # (was 32 when it inherited the flat
                                 # plan); matrix adds source joins + agg
    "simhash_bit_balance": 2,    # unpivot + bounded 16-row aggregate
                                 # over the checkpointed signatures
    "quality_drift_ks": 2,       # the scorer pass is aggregated +
                                 # checkpointed; spine joins + windows
                                 # ride the 10-row decile frame
    "embedding_centroid_confusion": 18,  # eval-path brute assignment:
                                 # (vec, label) decimal dot agg + norm
                                 # joins over the checkpointed element/
                                 # means frames; IVF is the scale path
    "lsh_capture_curve": 6,      # truth/candidate frames checkpointed
                                 # (recall report's shape); band agg
                                 # over the pair-id join
    "window_time_range_trailing": 2,  # one user-partition window pass
    "tpch_refresh_cycle": 4,     # upsert anti-join (keys broadcast) +
                                 # delete anti-join + the Q1 agg
    # round 9 wave 5 (catalog_r9b.py; measured at sf0.001)
    "unpivot_quarter_revenue": 1,  # the wide agg; UNPIVOT itself is a
                                 # zero-exchange per-row expand
    "grouped_moments_profile": 1,  # one map-side-combinable power-sum agg
    "parts_pareto_frontier": 2,  # (brand,size) grain agg + brand window
    "part_name_fuzzy_pairs": 0,  # brand-blocked self-join broadcasts at
                                 # fixture scale; a shuffle appearing
                                 # here means the block join regressed
    "events_forward_fill": 2,    # user-partition fill window + type agg
    "setjoin_prefix_filter_pairs": 6,  # sizes/df aggs + ordered join +
                                 # candidate distinct + verify join over
                                 # the ONE checkpointed shingle frame
    "embedding_hof_stats": 0,    # lambda HOFs are map-only: any exchange
                                 # means an explode crept back in
    "user_decay_scores": 2,      # 1-row max-day broadcast + user agg;
                                 # top-20 is TakeOrderedAndProject
    "neardup_triangle_count": 7,  # post-checkpoint: wedge self-join +
                                 # closing join + scalar stat aggs
    "weighted_median_price": 4,  # post-checkpoint: bucket probe/below
                                 # aggs + in-bucket finish window
    "neardup_bfs_hops": 1,       # final histogram agg (per-round BFS
                                 # joins live behind the checkpoints)
    "events_streak_histogram": 3,  # (user,day) distinct + island agg +
                                 # histogram agg (user window rides the
                                 # distinct's partitioning)
    "source_lang_chisq": 3,      # marginal aggs + cell join over the
                                 # checkpointed observed counts
    "user_clamped_ledger": 1,    # BOTH windows and the final agg share
                                 # the user_id partitioning: one
                                 # exchange serves the whole ledger
    "join_key_skew_report": 6,   # three key-grain aggs + their stat
                                 # rollups (2 each)
    "events_cumulative_reach": 4,  # first-seen agg + day aggs + the
                                 # bounded day-spine running sum
    "neyman_allocation_sample": 6,  # moment agg + tiny 5-row weight/
                                 # total/rank stages
    "schema_evolution_read": 1,  # one agg over the merged-schema scan
    "grouped_mode_exact": 2,     # grain agg + bounded rank window
    "lateral_recent_orders": 2,  # 10-row TakeOrdered spine + the
                                 # correlated per-key limit
    "grouping_id_report": 1,     # one expanded grouping-sets agg
    "zorder_locality_report": 1,  # one tile agg; the interleave is a
                                 # map-side projection
    "ivm_revenue_maintenance": 4,  # three partial aggs + the tiny
                                 # full-outer delta-apply chain
    # round 9 wave 11 (second extension session)
    "bitmap_presence_retention": 3,  # bitmap build pays its own
                                 # exchanges once (checkpointed); the
                                 # report = 2 word-grain aggs + the
                                 # adjacent-day join
    "bitmap_audience_jaccard": 4,  # checkpointed bitmap + totals agg +
                                 # word-aligned pair agg + spine joins
    "candidate_graph_pagerank": 0,  # every iteration checkpointed; the
                                 # top-20 is TakeOrderedAndProject
    "customer_survival_km": 4,   # per-customer LEAD window + duration
                                 # agg + ONE shared exchange for both
                                 # value-grain windows + horizon scalar
    "daily_series_crosscorr": 3,  # daily agg + lag-spine join + moments
    "events_cusum_changepoint": 2,  # daily agg + the bounded-day window
                                 # stages (mean + cusum share the sort)
    "segment_monthly_trend": 2,  # monthly grain agg + moments agg
                                 # (customer dim broadcasts)
    "nation_balance_report": 4,  # one agg per rewritten scalar subquery
                                 # (count/max/sum/region-sum), all
                                 # broadcast back onto the 25-row spine
    "docs_equidepth_bands": 2,   # value-grain agg + per-source window
                                 # feeding the band rollup
    "benford_deviation_report": 2,  # digit-grain agg + priority window
                                 # (spine joins broadcast)
    "bitmap_rollup_persisted": 3,  # range read only: per-(day,word)
                                 # BIT_OR + day popcount agg + the
                                 # word-grain range OR (build/append/
                                 # compact pay theirs at write time)
    "bitmap_rollup_grouped_range": 2,  # (g, word) BIT_OR + popcount agg
    "stream_bitmap_rollup_store": 3,  # same range-read shape as the
                                 # batch store (writes via foreachBatch)
    "approx_percentile_audit": 2,  # sketch+exact agg + broadcast-probe
                                 # agg (the 15-row side broadcasts)
    "neardup_kcore": 2,          # final degree agg + histogram agg
                                 # (peel rounds pay theirs before the
                                 # checkpoint)
    "not_in_null_semantics": 3,  # one agg per scalar subquery (the
                                 # null-aware anti join broadcasts)
    "events_score_auc": 4,       # per pair: score-grain agg + the
                                 # bounded-domain cumulative window
    "text_source_log_parse": 1,  # one agg over the text scan (the
                                 # render/write pays before the read)
    "binary_source_blob_stats": 0,  # map-only fingerprint projection
                                 # over the binaryFile scan
    "setops_all_multiset": 2,    # one agg per multiset branch (the
                                 # EXCEPT/INTERSECT ALL sides ride the
                                 # same scan partitioning)
    "events_rolling_median_exact": 2,  # daily agg + the bounded-day
                                 # window sort
    "segment_interval_coverage": 2,  # per-customer windows share one
                                 # exchange + the segment rollup
    "udtf_order_schedule": 1,    # one agg over the UDTF expansion
    "region_nation_namelist": 1,  # one agg (region dim broadcasts)
    "orders_flag_aggregates": 1,  # one grouped flag aggregate
    "bitmap_rolling_reach": 4,   # day spine + word-grain window join
                                 # agg + day rollup over the
                                 # checkpointed bitmap table
    "winsorized_mean_report": 1,  # bounds agg rides the same grouping
                                 # as the final agg (5-row broadcast)
    "user_customer_full_outer_recon": 3,  # distinct + full-outer SMJ
                                 # + side rollup
    "groupby_all_sugar": 1,      # one inferred-key aggregate
    # wave 18 (stream_full_outer_join excluded like the other
    # streaming entries - counting its plan runs the query)
    "posexplode_positions": 0,   # map-only positional explode
    "try_cast_quality_gate": 1,  # one grouped gate aggregate
    "daily_revenue_runs_test": 4,  # daily agg + 1-row median + the
                                 # bounded-day LAG window + final agg
    "jackknife_mean_variance": 3,  # block agg paid once (checkpointed);
                                 # the loo/mean/deviation chain rides
                                 # the <= |days| view
    "capture_recapture_estimate": 2,  # ONE user-grain pass + 1-row agg
    "survival_logrank_test": 6,  # duration agg checkpointed; spine
                                 # distinct + per-segment windows +
                                 # pivot + final, all value-grain
    "segment_theilsen_trend": 2,  # monthly agg checkpointed; bounded
                                 # pair self-join + median agg
    "text_collocations_pmi": 3,  # bigram counts checkpointed; marginal
                                 # aggs ride the vocab-bounded view
    # round 10 backfill (VERDICT r9 #3): every remaining catalog entry,
    # measured at sf0.001 — the gate now covers the WHOLE catalog, so
    # any new exchange in any entry's static plan is a visible failure.
    # Streaming entries pin the post-stream read-back query's plan.
    "stream_mg_rollup_store": 4,
    "stream_left_outer_join": 0,
    "stream_full_outer_join": 0,
    "stream_crawl_dedup": 1,
    "stream_quality_monitor": 0,
    "kmeans_ivf_train": 3,
    "q3_shipping_priority": 1,
    "q4_order_priority": 1,
    "q14_promo_revenue": 1,
    "q18_large_orders": 1,
    "date_functions": 0,
    "partitioned_etl_rollup": 1,
    "text_top_bigrams": 2,
    "events_funnel": 2,
    "embedding_quantize_int8": 0,
    "events_heatmap": 1,
    "multimodal_frame_sample": 1,
    "media_dedup_digest": 1,
    "stream_foreachbatch_sink": 1,
    "stream_asof_enrich": 0,
    "stream_late_data_accounting": 0,
    "hll_cardinality_grouped": 4,
    "hll_union_audience": 6,
    "multimodal_ppm_decode": 0,
    "bucketed_etl_revenue": 1,
    "stream_cms_rollup_store": 1,
    "stream_hll_daily": 1,
    "pandas_udaf_quantiles": 1,
    "sample_fixed_k": 0,
    "stratified_sample": 1,
    "weighted_sample_per_group": 1,
    "orders_by_month": 1,
    "multimodal_features": 1,
    "multimodal_resize_meta": 1,
    "events_json_extract": 1,
    "events_asof_forward": 1,
    "stream_sliding_10x5": 0,
    "stream_session_30min": 0,
    "stream_tumbling_5min": 0,
    "stream_click_purchase_join": 0,
    "events_anomaly_zscore": 2,
    "dedup_pipeline_summary": 6,
    "dedup_exact": 1,
    "dedup_minhash_signature": 2,
    "dedup_minhash_lsh_pairs": 4,
    "dedup_components": 0,
    "dedup_simhash": 2,
    "dedup_simhash_candidates": 16,
    "text_winnow_fingerprint": 2,
    "text_token_count": 0,
    "text_lang_id": 0,
    "text_quality_score": 0,
    "text_fingerprint": 0,
    "embedding_neardup": 1,
    "ann_topk_cosine": 3,
    "ann_lsh_pairs": 2,
    "ann_ivf_topk": 11,
    "stream_cms_heavy_hitters": 2,
    "stream_tdigest_daily": 2,
    "ann_ivfpq_topk": 19,
    "stream_bloom_seen_index": 11,
    "stream_packing_ledger": 6,
    "stream_hll_cardinality": 2,
    "stream_dedup_counts": 0,
    "stream_dedup_watermark": 0,
    "stream_stateful_counts": 0,
    "stream_static_enrich": 0,
    "quantile_sketch_grouped": 2,
    "corpus_source_mix": 2,
    "dedup_crosslingual_pairs": 5,
    "embedding_label_centroids": 2,
    "embedding_pca_power": 2,
    "ann_ivf_trained_topk": 6,
    "ann_pq_topk": 9,
    "ann_pq_trained_topk": 3,
    "text_bigram_cross_entropy": 10,
    "text_lang_id_confusion": 1,
    "text_repetition_ratio": 3,
    "range_join_prices": 1,
    "semi_join_orders": 1,
    "anti_join_customers": 1,
    "cross_join_region_nation": 0,
    "grouped_mean": 1,
    "agg_all_sd": 1,
    "keyby_sorted": 2,
    "distinct_segments": 1,
    "count_distinct": 2,
    "union_all_counts": 2,
    "intersect_custkeys": 1,
    "except_custkeys": 2,
    "window_topk_per_group": 1,
    "window_running_sum": 1,
    "window_lag_lead": 1,
    "rollup_agg": 1,
    "cube_agg": 1,
    "grouping_sets": 1,
    "pivot_linestatus": 2,
    "two_phase_agg": 2,
    "percentile_exact": 1,
    "part_brand_stats": 2,
    "generator_source": 2,
    "csv_roundtrip": 1,
    "json_roundtrip": 1,
    "balanced_sample_per_group": 1,
    "clean_corpus_pipeline": 4,
    "string_functions": 0,
    "array_functions": 0,
    "weighted_sample_topk": 0,
    # round 10 (depth entries)
    "setjoin_index_persisted": 3,  # candidate distinct + verify agg over
                                 # the checkpointed store reads (build/
                                 # append/compact pay theirs pre-read)
    "setjoin_index_probe": 4,    # batch shingle agg + prefix window +
                                 # candidate/verify aggs — store sides
                                 # stay LAZY (pruned scans), only the
                                 # twice-consumed batch shingles are
                                 # checkpointed
    "setjoin_delete_compliance": 3,  # same plan as the plain pairs read
                                 # (candidate distinct + verify agg +
                                 # lazy prefix distinct); tombstone
                                 # anti-joins are broadcast, the tiny
                                 # tombstone DISTINCT is checkpointed
    "hybrid_retrieval_rerank": 2,  # candidate-embedding join + the
                                 # rerank window over stage-1's <=20
                                 # checkpointed rows (bounded by
                                 # construction, never the corpus)
    "semantic_dedup_clusters": 4,  # cell-size agg + pair agg + dropped
                                 # distinct-agg over the checkpointed
                                 # assignment/pair stages + report join
    "stream_bm25_index_store": 2,  # same read shape as the batch
                                 # entry, over the compacted store
    "bm25_index_persisted": 2,   # df agg + per-doc sum over the
                                 # checkpointed term-pruned store
                                 # reads (scoring joins broadcast);
                                 # top-k is TakeOrderedAndProject
    "bm25_topk_retrieval": 4,    # qtok tf agg + df agg + dl scoring
                                 # join + per-doc sum over checkpointed
                                 # tok/dl/corpus stats; top-k is
                                 # TakeOrderedAndProject
    "stream_semantic_crawl": 0,  # read-back of the per-batch probe
                                 # sinks is a pure scan (cosine pairs)
    "stream_simhash_crawl": 0,   # read-back of the per-batch probe
                                 # sinks is a pure scan (hamming pairs)
    "stream_setjoin_crawl": 0,   # read-back of the per-batch probe
                                 # sinks is a pure scan; each trigger's
                                 # probe paid its own exchanges in-batch
    "bitmap_delete_compliance": 3,  # (day,word) OR + range OR + total
                                 # agg over the checkpointed scrubbed
                                 # words; tombstone masks broadcast
    "simhash_index_probe": 4,    # batch unique-sig distinct +
                                 # sig-pair candidate distinct + the
                                 # doc fan-out joins over the
                                 # CHECKPOINTED scrubbed store read
    "simhash_delete_compliance": 4,  # same probe shape; the tombstone
                                 # anti-join is broadcast inside the
                                 # checkpointed store read
    "semantic_delete_compliance": 2,  # batch assignment window + the
                                 # scrubbed same-cell pair join (store
                                 # + tombstone sides broadcast-scale)
    "stream_mg_grouped_store": 6,  # post-stream read-back: summary
                                 # distinct + thr distinct + per-g total
                                 # + per-key agg + rank window + audit
                                 # join, all store-geometry-bounded
    "lsh_delete_compliance": 9,  # batch signature agg + band explode
                                 # distinct + store key projections
                                 # (2 DISTINCTs) + decision joins; the
                                 # tombstone anti-joins are broadcast
    "semantic_requantize_recall": 11,  # store-rows distinct + same-cell
                                 # pair join + brute pair join over the
                                 # CHECKPOINTED v + 1-row scalar aggs
    "setjoin_expire_retention": 3,  # the plain 3-exchange pairs read;
                                 # the retention filter is a pushed
                                 # scan predicate, zero new exchanges
    "bm25_expire_retention": 2,  # the plain store top-k read; the
                                 # retention filter is a pushed scan
                                 # predicate, zero new exchanges
    "lsh_expire_retention": 7,   # the plain probe shape (batch sig agg
                                 # + band distinct + key projections +
                                 # decision joins); retention is a
                                 # pushed scan predicate
    "semantic_expire_retention": 1,  # batch assignment window; the
                                 # same-cell join sides broadcast-scale
    "bm25_delete_compliance": 2,  # the plain store top-k read; the
                                 # tombstone scrub is a broadcast
                                 # anti-join, zero new exchanges
    "semantic_requantize_trained": 2,  # store-rows distinct + same-cell
                                 # pair join (training paid off-plan
                                 # inside the requantize verb)
    # round 12 (retrain/retention verbs — VERDICT r11 #3/#5)
    "ann_ivf_requantize": 3,     # probe window + rank window over the
                                 # re-frozen store (training paid
                                 # off-plan inside the requantize verb;
                                 # same shape as ann_ivf_persisted_topk)
    "ann_pq_requantize": 2,      # ADC per-(query, vector) agg + rank
                                 # window; codebook broadcast (same
                                 # shape as ann_pq_persisted_topk)
    "ann_ivfpq_requantize": 4,   # probe window + residual dtab + ADC
                                 # agg + rank window over the re-frozen
                                 # three-part store (same shape as
                                 # ann_ivfpq_persisted_topk; retrain
                                 # paid off-plan inside the verb)
    "ann_ivf_expire_retention": 3,  # probe window + dedupe/rank windows
                                 # — the retention cutoff is a pushed-
                                 # down filter on the inverted scan,
                                 # zero new exchanges (same shape as
                                 # ann_ivf_persisted_topk)
    "mg_chunk_retention": 5,     # summary distinct + thr distinct +
                                 # per-group total + per-key agg + rank
                                 # window — all store-geometry-bounded
                                 # (same shape as stream_mg_grouped's
                                 # read-back, one less audit join)
    "cms_chunk_retention": 1,    # top-k audit agg; the SUM-merged
                                 # sketch read and probe are broadcast-
                                 # scale (same shape as
                                 # cms_rollup_persisted)
    "stream_ivf_index_store": 3,  # post-stream read-back: probe window
                                 # + dedupe/rank windows over the
                                 # cid-pruned store scan (same shape
                                 # as ann_ivf_persisted_topk; training
                                 # paid per-trigger inside the stream)
    "multimodal_resize_pipeline": 0,  # synth + decode + resize are
                                 # map-only mapInPandas
    "multimodal_jpeg_decode": 0,  # synth + decode are map-only
    "multimodal_jpeg_progressive": 0,  # multi-scan codec complexity
                                 # lives inside the Arrow kernels —
                                 # the plan stays two back-to-back
                                 # mapInPandas stages, zero exchanges
                                 # mapInPandas (the PNG/WAV shape)
    "multimodal_png_color_types": 0,  # r15: all five color types —
                                 # per-bpp filtering / PLTE / Adam7
                                 # live inside the Arrow kernels; the
                                 # plan stays two back-to-back
                                 # mapInPandas stages, zero exchanges
    "multimodal_jpeg12_decode": 0,  # r15: 12-bit SOF1 codec pair —
                                 # same two back-to-back mapInPandas
                                 # stages, zero exchanges
    "multimodal_png16_decode": 0,  # r15: 16-bit PNG codec pair at
                                 # full sample precision — same two
                                 # back-to-back mapInPandas stages,
                                 # zero exchanges
    "rollup_day_retention": 1,   # per-day estimate agg over the
                                 # partition-pruned register store —
                                 # the retention marker and guard are
                                 # metadata-only (same shape as
                                 # stream_hll_daily's read-back;
                                 # appends paid per-day off-plan)
}


def test_budget_covers_whole_catalog():
    """The gate's 'whole catalog' claim, made scriptable (r14): every
    registered entry has an exchange budget — a new entry cannot land
    without declaring its shuffle contract."""
    assert set(BUDGET) == set(CATALOG), (
        sorted(set(CATALOG) ^ set(BUDGET))
    )


@pytest.mark.parametrize("name", sorted(BUDGET))
def test_exchange_budget(spark, sf_dir, name):
    df = CATALOG[name].fn(spark, sf_dir)
    n = exchange_count(df)
    assert n <= BUDGET[name], (
        f"{name}: {n} exchanges > budget {BUDGET[name]} — a shuffle crept "
        "into the plan"
    )
