"""Regenerate PLANS.md (physical-plan snapshots of flagship queries)."""
from big_data_table_spark.session import connect
from big_data_table_spark.catalog import CATALOG
from big_data_table_spark.plans import formatted_plan

PICKS = {
    "q1_pricing_summary": "Single scan with pushdown + pruning, partial->exchange->final aggregate. One shuffle.",
    "join3_revenue_by_segment": "Fact-fact sort-merge on orderkey + broadcast customer; one agg shuffle after.",
    "supplier_chain": "Two broadcast joins, zero fact-side shuffles; only the final groupBy exchanges.",
    "topk_orders": "TakeOrderedAndProject: per-partition heaps + driver merge, no global sort.",
    "events_asof_purchase": "As-of via union+window: exactly one exchange (the window partitionBy).",
    "dedup_minhash_lsh_pairs": "Shingle explode -> signature agg (persisted) -> band self-join -> distinct.",
    "embedding_neardup": "Banded-LSH candidates (mapInPandas numpy signatures, checkpointed) -> bucket self-join -> broadcast exact-cosine verify. No label-block cartesian.",
    "quantile_sketch_grouped": "Mergeable histogram: one map-side-combinable (group, bin) aggregate, then window cumsum over the tiny sketch.",
    "q21_suppliers_kept_waiting": "EXISTS/NOT EXISTS as LeftSemi+LeftAnti broadcast joins, one agg exchange, TakeOrderedAndProject top-10. At 100 TB AQE re-plans the lineitem sides to shuffle joins co-partitioned on l_orderkey.",
    "q15_top_supplier": "Max-selection without collect: revenue agg -> 1-row MAX -> broadcast equality join back. Three exchanges total, none over the fact table twice.",
    "q9_product_type_profit": "Derived-partsupp join batch: one partsupp aggregate exchange, part/nation broadcast, orders broadcast at fixture scale (AQE re-plans to co-partitioned shuffle join at 100 TB), one profit agg exchange.",
    "q2_min_cost_supplier": "Correlated-MIN as per-part aggregate rejoined on cost equality; supplier dim collapses to one broadcast, TakeOrderedAndProject top-100.",
    "tdigest_quantiles_grouped": "Two-phase sketch: MapInPandas partials BELOW the only exchange (centroid arrays shuffle, raw values never), applyInPandas merge, broadcast rank-check join back.",
    "sequence_packing": "Two-phase distributed prefix sum: in-bucket window cumsum partitioned by the md5-prefix range bucket, 256-row bucket-offset table broadcast back, final bin aggregate. No global sort anywhere.",
    "bloom_membership_audience": "Relational Bloom filter: set-bit build DISTINCT (<= m rows per partition map-side), probe positions left-joined against the broadcast set-bit table, one audit aggregate.",
    "cms_heavy_hitters": "Count-Min build: map-side (row, col) aggregation straight off the hashed event stream — the d*w counter table is the only thing shuffled; exact top-k probe joins against the broadcast sketch.",
    "multimodal_png_decode": "Entirely map-only: synth encoder and inflate+unfilter decoder are back-to-back Arrow-batched mapInPandas stages, zero exchanges.",
    "hll_rollup_persisted": "Persisted continuous aggregate: partition-pruned scan of the day-partitioned sketch table, register MAX-merge + 1-row assembly. NO events scan anywhere in the range-query plan.",
    "theta_overlap_by_source": "Per-group KMV samples from ONE partitioned-window rank; pair spine, intersection probe and audit all reuse the checkpointed <=k-row tables.",
    "text_token_count_subword": "Greedy-walk token counts per word TYPE (iterative joins paid before checkpoints); the visible plan is just the doc-words join + per-doc aggregate.",
    "tdigest_rollup_range": "Persisted quantile rollup: the store side is a scan of day-partitioned digest rows + one applyInPandas merge; the events scan in this plan is the rank AUDIT only (the oracle hook), not the estimate path.",
    "training_order_shuffle": "Global permutation without a global sort: in-bucket row_number partitioned by the md5-prefix bucket + broadcast 256-row offset join. The oracle's single-partition ROW_NUMBER never appears.",
    "bloom_index_persisted": "Seen-keys probe: the store is a broadcast <=m-row position table; the batch's key positions left-semi join it map-side — the batch never shuffles for the membership decision.",
    "dedup_keep_best_quality": "Keeper selection: component labels come from the checkpointed propagation; the visible plan is one per-component rank window + the broadcast keeper join.",
    "corpus_data_card": "One pass to the datasheet: per-doc feature aggregates (shingle repeat, lang scores, quality) joined on doc_id, digest-distinct for redundancy, one per-source rollup. Text is read once.",
    "ann_ivfpq_persisted_topk": "IVFADC from the store: broadcast centroids pick cells, residual distance tables broadcast against the cid-partitioned codes scan. Neither Lloyd chain appears — train-once is visible in the plan.",
    "curriculum_serving_order": "The loader stream: two-phase bucket rank over the checkpointed epoch-resample multiset; the oracle's global ROW_NUMBER never appears.",
    "theta_rollup_persisted": "Persisted KMV store range read: theta-union estimator assembled over the checkpointed partition-pruned sample scan (days*k rows); build/append/compact ran before this plan existed. The events scan is the exact AUDIT only.",
    "dedup_substring_fraction": "Substring-dup audit: gram digests aggregate map-side, only SPARSE shared-start rows reach the per-doc LAG window — the interval union replaces any per-position table.",
    "curriculum_packed_batches": "Resample -> interleave -> pack in one plan: checkpointed pick multiset joined to token counts, then the standard two-phase packer; per-bin aggregate carries the n_sources mixing audit.",
    "events_top_paths": "Sessionize window cascade partitioned by user, ordered path rebuild in the per-session aggregate, TakeOrdered top-15. No unpartitioned corpus window.",
    "ann_recall_report": "The evaluation job: IVF probe chain and the exact arm's corpus scan feed one FULL-join recall aggregate — the exact arm is the cost a sampled query set bounds in production.",
    "parts_abc_analysis": "Pareto classification without a global sort: in-band cumsum windows partitioned by the 256 revenue bands, cumulated band offsets broadcast back, exact-decimal additions end to end.",
    "events_rfm_segments": "Three chained two-phase rank scans over the checkpointed per-user table (calendar, capped-count and log10 bands) + the cell aggregate — the oracle's three global sorts never appear.",
    "dedup_cascade": "Stage attribution over CHECKPOINTED substring per-doc and band tables: broadcast stage-flag joins + one rollup — the inlined single-statement form's 27 exchanges collapse to 4.",
    "cms_rollup_persisted": "Persisted CMS store range read: partition-pruned counter scan SUM-merged (checkpointed), exact top-20 probe broadcast against it. Build/append/compact ran before this plan existed; the events scan is the exact AUDIT side only.",
    "orders_market_basket": "Orderkey-keyed pair self-join over the checkpointed item table (fan-out bounded by items/order), pair aggregate, TakeOrderedAndProject top-20 broadcast into the part-count lookups. No part cartesian anywhere.",
    "events_funnel_windowed": "Two chained user-partitioned window passes (view->click, click->purchase encoded MAX) + three count-distinct aggregates off the checkpointed qualified-click table. No self-join for the sequence match.",
    "events_user_gini": "Sorted-rank Gini without a global sort: two-phase banded rank over per-user counts (checkpointed), 1-row stats broadcast, one weighted-sum aggregate.",
    "vocab_oov_curve": "Train-frequency rank via two-phase position over the checkpointed token table, test-side counts left-joined, 3-row size grid broadcast — the oracle's global ROW_NUMBER never appears.",
    "mg_rollup_persisted": "Persisted SpaceSaving store range read: partition-pruned summary scan (checkpointed), per-key bound algebra, TakeOrderedAndProject top-20 broadcast into the exact-audit join. The events scan is the audit side only; the bounds come from the store alone.",
    "events_peak_concurrency": "Sessionize (user-partitioned windows) -> interval-to-grid-cell explode -> cell aggregate (checkpointed, calendar-bounded) -> day-max + earliest-cell witness join. No unbounded running sum.",
    "simhash_hamming_histogram": "Signature frame checkpointed once; band self-join builds candidates, two broadcast-sized signature lookups compute 16 CASE-term hamming, bounded 17-row histogram aggregate.",
    "embedding_anisotropy_report": "Id-bucket pair sampling: bucket equi-join (1/16 of all pairs, no n^2 predicate), rounded-cosine bin aggregate, share via window over the bounded 20-row bin table.",
    "setjoin_index_persisted": "Exact set-similarity join from the persisted index: prefix-to-prefix candidate join over the store's rarest-shingle prefixes + length filter, exact verify against the checkpointed shingle sets. The corpus text is never rescanned; build/append/compact ran before this plan existed.",
    "setjoin_index_probe": "Probe-before-append: batch shingles checkpointed once (two consumers), batch prefixes ranked under the store's FROZEN order, store prefix/shingle sides stay LAZY pruned scans — batch-sized work against a corpus-sized store.",
    "stream_mg_grouped_store": "Chunked grouped SpaceSaving range read after the stream: partition-pruned summary scan, per-(day,chunk,g) threshold algebra, per-group rank over store-geometry-bounded rows, broadcast exact-audit join.",
    "setjoin_prefix_filter_pairs": "Exact similarity join via prefix filtering: ONE checkpointed shingle frame feeds sizes/df/ordering; rarest-shingle prefixes self-join for candidates (the boilerplate-skew inverse), exact verify touches candidate pairs only. The oracle's all-shared-shingle fan-out never appears.",
    "neardup_triangle_count": "Degree-oriented triangle counting: checkpointed edges/degrees/orientation, wedges generated at the lowest-degree apex (hub-proof), one equi-join closes triangles. 7 exchanges vs 20 for the inlined form.",
    "weighted_median_price": "Two-phase exact weighted median: 64-bucket routing aggregate + bounded bucket-cumsum window, finish window INSIDE the median bucket only. The oracle's per-group full-table cumulative window never appears.",
    "user_clamped_ledger": "Clamped running balance via the closed form: BOTH stacked per-user windows and the final aggregate share ONE user_id exchange — a stateful sequential scan expressed as windows.",
    "embedding_hof_stats": "Higher-order array lambdas: transform/filter/fold run inside the projection — map-only, explode-free, ZERO exchanges.",
    "bitmap_rollup_persisted": "Exact bitmap store range read: partition-pruned (day, word) bitmap scan, BIT_OR merge absorbing chunks AND replays in the same aggregate, popcount sums. The events scan never appears — the oracle's COUNT(DISTINCT) is answered from the index alone.",
    "candidate_graph_pagerank": "Decimal-exact PageRank: every iteration checkpointed (the plan shows only the final top-20 TakeOrderedAndProject over the last rank table) — lineage truncation is the visible design.",
    "events_score_auc": "Exact ROC-AUC at the value grain: score-domain aggregate + bounded cumulative window per class pair; the raw-row global rank sort the textbook formula implies never appears.",
    "setjoin_delete_compliance": "Tombstone-scrubbed exact pairs: deleted doc_ids (tiny checkpointed DISTINCT, broadcast) anti-joined out of BOTH store relations BEFORE the candidate join — same 3-exchange shape as the plain pairs read; no store rewrite appears anywhere.",
    "bm25_topk_retrieval": "BM25 over checkpointed index statistics: query-term tf/df aggregates, broadcast idf + (N,avgdl) scalar into the dl scoring join, DECIMAL-exact per-doc sum, TakeOrderedAndProject top-20. The corpus token explode is paid once, before this plan.",
    "bm25_index_persisted": "BM25 from the persisted inverted index: the tf read is a term-PRUNED postings scan (PushedFilters In(tk, ...)) SUM-merged across chunks; the final plan runs over checkpointed store aggregates only — no documents scan exists anywhere.",
    "semantic_dedup_clusters": "SemDeDup report: per-cell stats + dominated-vector distinct over the CHECKPOINTED assignment and within-cell pair stages; the pair join is cell-bounded (sum of cell-size^2), never corpus-quadratic.",
    "hybrid_retrieval_rerank": "Two-stage retrieval: the rerank joins the checkpointed <=20-row BM25 candidates to their embeddings and ranks in ONE bounded window — stage 2 costs |candidates| dot products by construction.",
    "stream_semantic_crawl": "Crawl read-back: a pure scan of the per-trigger probe sinks — each trigger paid |batch| frozen-quantizer assignment + same-cell verification in its own micro-batch plan.",
    "ann_ivf_requantize": "Search over the RE-QUANTIZED IVF store: broadcast re-frozen centroids pick cells, cid-partitioned inverted scan + rank window — the retrain (Lloyd over survivors) ran inside the verb, before this plan existed; no tombstone scrub remains (the purge rode along).",
    "mg_chunk_retention": "Grouped range read after chunk expiry: the partition-pruned summary scan simply no longer lists the dropped chunk dirs — retention is invisible to the plan, exactly like day-level expiry; bound algebra unchanged over the surviving (day, chunk, g) summaries.",
}

if __name__ == "__main__":
    spark = connect(shuffle_partitions=32)
    out = ["# PLANS — physical-plan snapshots of flagship queries", "",
           "Generated from `.explain('formatted')` at sf0.001 (plan shape is",
           "scale-invariant; AQE refines at runtime). Regenerate with",
           "`python tools_regen_plans.py`. These are the plans the engine is",
           "DESIGNED to produce; tests/test_plans.py pins the load-bearing",
           "properties (pushdown, pruning, broadcasts, exchange counts).", ""]
    for name, note in PICKS.items():
        plan = formatted_plan(CATALOG[name].fn(spark, "/root/testdata/sf0.001"))
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.split(chr(10)+chr(10))[0]}\n```\n")
    open("PLANS.md", "w").write("\n".join(out))
    spark.stop()
