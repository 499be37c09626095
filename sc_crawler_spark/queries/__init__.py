"""Declared query inventory.

Each submodule exposes ``QUERIES: dict[str, tuple[fn, sql]]`` where ``fn``
is ``(spark, sf_dir) -> DataFrame`` and ``sql`` is the equivalent DuckDB
oracle (or ``None`` for non-SQL-expressible ops). ``__spark_entry__.py``
assembles the full registry from here.

Cross-engine determinism conventions used throughout (see SURVEY.md §7.4):

- every SUM/AVG over doubles goes through DECIMAL (order-independent);
- every double output column is ``round(x, n)`` in BOTH engines;
- every top-k / keep-first has a TOTAL order (explicit tiebreakers);
- hashes are MD5/SHA2 over strings built identically in both engines;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from . import curation, dims, domain, extra, lifecycle, pipeline, tpch

REGISTRY: dict[str, tuple] = {}
for mod in (tpch, lifecycle, pipeline, domain, extra, dims, curation):
    overlap = REGISTRY.keys() & mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(mod.QUERIES)

# The round driver checks queries in registry order and caps at 50; the
# registry holds more, so the window ROTATES each round: queries without
# fresh driver evidence go to the front, queries that went green in the
# PREVIOUS round's CORRECTNESS file rotate to the tail (they keep pass†
# status — tests/test_queries_oracle.py re-runs the identical oracle
# check for every registry entry on every round).
#
# Evidence ledger entering r6: CORRECTNESS_r05 went 48/50 hash-green
# (+2 rows-only by then-current design); the union of r1-r5 covers
# EVERY pre-r6 registry name. Rotation: new r6 queries first (IVF x SQ
# composed ANN, TPC-H q9/q16), then the queries whose CODE changed this
# round and therefore need fresh driver evidence (pack_sequences_docs
# gained a recursive-CTE oracle — no longer rows-only; q3/q5 were
# rewritten in star-join order), then the 38 names whose latest driver
# green is r4 (r5's un-windowed middle + tail). The r5 fresh greens
# rotate tailward past the 50-query cap, still re-verified every round
# by tests/test_queries_oracle.py.
#
# r7 rotation: CORRECTNESS_r06 went 50/50 hash-green over the first 50
# registry names, so every OTHER name's latest driver evidence is r5 —
# those 43 rotate to the front, behind the r7 new/changed queries. r7
# added 23 new entries (the TPC-H completions + the text/analytics/
# timeseries/graph/PQ tier) + 3 changed, so the TAIL of the r5-stale names
# falls past the 50-query driver cap this round — those stay
# pytest-oracle-verified and rotate to the front in r8.
#
# r8 rotation: CORRECTNESS_r07 went 48/50 hash-green (+2 rows-only by
# design) over the first 50 names. Evidence ledger entering r8:
# 16 names last green in r5 (they fell past r7's cap) -> FRONT, per
# the r7 verdict; then r8's 13 new/changed entries (8 brand-new
# queries + 5 whose code changed: residual IVF-PQ, the two
# shared-pair-source graph queries, and the two scaling-dim hint
# drops); then the 50 names last green in r6 (r7's tail), of which
# the first 21 make this round's 50-query window. The r7 fresh greens
# rotate to the tail. After r8 greens, the oldest driver evidence is
# the 29 r6 names past the cap -> they head the r9 window.
_PRIORITY = [
    # --- r17 rotation (r16 verdict task 1). Evidence ledger entering
    # r17, from the r16 verdict's recomputed r1-r16 union: 50 names
    # r16-fresh, 46 r15-fresh, 42 r14-fresh, 22 r13-stale, 5
    # brand-new this round (retrieval_eval — the ranked-retrieval
    # scoreboard, task 2; mmr_select — MMR diversity selection,
    # task 8; ann_recall_eval — the ANN ladder's recall@5 as a
    # driver-visible oracle row; corpus_diversity_stats — per-source
    # type-token / distinct-bigram / entropy mode-collapse detectors;
    # dedup_pair_eval — MinHash-LSH pair precision/recall vs the
    # exact unblocked Jaccard truth). Window: the 22 r13-stale names
    # FIRST (the staged head of the r16 _TAIL, keeping the promise
    # that no name's driver evidence ages past 3 rounds), then the 9
    # names whose CODE is new or changed this round — the five new
    # entries; bm25_retrieval (Robertson -> Lucene idf after
    # retrieval_eval exposed the negative-idf collapse);
    # weighted_sample_docs (zero-length weight guard, ADVICE #2);
    # hybrid_rrf_retrieval + contrastive_triplets (dense-arm serve
    # probe 3 -> 4, task 3) — then the 19 stalest r14 greens. The 23
    # remaining r14 names head _TAIL and rotate first in r18; after
    # r17 greens no name's evidence is older than r14. ---
    "benchmark_config_pk",
    "config_tolerance_filter",
    "dedup_boilerplate_chunks",
    "dedup_embed_cosine",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprint",
    "media_jpeg_color_stats",
    "training_corpus_emit",
    "doc_quality_lr_train",
    "doc_quality_lr_apply",
    "bpe_train_merges",
    "bpe_tokenize_apply",
    "doc_lm2_perplexity",
    "doc_ngram_novelty",
    "source_embed_similarity",
    "bigram_pmi_top",
    "lr_calibration_bins",
    "source_token_kl",
    "doc_oov_rate",
    # new / code-changed this round (fresh evidence needed)
    "retrieval_eval",
    "mmr_select",
    "ann_recall_eval",
    "corpus_diversity_stats",
    "dedup_pair_eval",
    "bm25_retrieval",
    "weighted_sample_docs",
    "hybrid_rrf_retrieval",
    "contrastive_triplets",
    # stalest r14 greens (22 of 42)
    "approx_heavy_hitters",
    "cluster_balanced_sample",
    "unimax_mixture_weights",
    "dedup_edit_similarity",
    "quality_quantile_normalize",
    "dsir_select",
    "doc_quality",
    "doc_token_stats",
    "ecpus_scalability",
    "embed_ann_ivf",
    "embed_cosine_topk",
    "first_version_orders",
    "hash_diff_sync",
    "heavy_hitter_users",
    "json_props_extract",
    "merge_upsert_lifecycle",
    "range_join_event_window",
    "running_user_value",
    "scd2_latest_event",
]
_TAIL = [
    # The 23 r14-stale names left past the 50-slot cap
    # (shuffled_sample_orders, standardize_part_names, and sync_stats
    # displaced by the third through fifth new r17 entries:
    # ann_recall_eval, corpus_diversity_stats, dedup_pair_eval) —
    # they rotate FIRST in r18 (pytest re-runs their oracles every
    # round meanwhile).
    "shuffled_sample_orders",
    "standardize_part_names",
    "sync_stats",
    "tiered_price_billing",
    "tumbling_daily_stats",
    "workload_breakdown",
    "workload_catalog_breakdown",
    "workload_profiles_catalog",
    "workload_scores",
    "embed_kmeans_clusters",
    "embed_ann_sq",
    "q10_returned_items",
    "dedup_canonical_by_rank",
    "dedup_cluster_resolve",
    "doc_pagerank",
    "dedup_span_removal",
    "media_pcm_stats",
    "media_pixel_stats",
    "media_video_frames",
    "media_resize_stats",
    "domain_balanced_sample",
    "html_extract_text",
    "dedup_containment",
    # r15-fresh (CORRECTNESS_r15 greens) — next-stalest.
    "embed_ann_pq",
    "approx_median_price",
    "approx_distinct_users",
    "event_anomaly_zscore",
    "twap_user_value",
    "gap_fill_daily_value",
    "funnel_conversion",
    "cohort_retention",
    "chunk_documents",
    "q6_forecast_revenue",
    "tfidf_keywords",
    "doc_lm_perplexity",
    "perplexity_bucket_filter",
    "q20_dominant_suppliers",
    "q14_promo_effect",
    "q22_global_sales_opportunity",
    "doc_bpe_token_stats",
    "q11_important_stock",
    "q21_single_supplier_blame",
    "q13_customer_distribution",
    "q15_top_supplier",
    "session_counts",
    "embed_ann_ivf_sq",
    "training_set_select",
    "q7_volume_shipping",
    "doc_repetition",
    "doc_pii_scrub",
    "decontaminate_docs",
    "lang_balanced_sample",
    "training_shard_stats",
    "q2_min_price_order",
    "q4_order_priority",
    "cube_revenue",
    "rollup_revenue",
    "pivot_status_counts",
    "moving_range_avg",
    "intersect_repeat_buyers",
    "temperature_mix_sample",
    "profile_orders",
    "region_dims_rollup",
    "vendor_compliance_matrix",
    "spot_price_asof",
    "media_metadata_extract",
    "anti_join_no_orders",
    "keep_last_dedup_lineitem",
    "except_building_buyers",
    # r16-fresh (CORRECTNESS_r16 greens, minus this round's
    # re-promoted code-changed names) — freshest evidence, deepest
    # tail.
    "argmax_customer_per_nation",
    "media_jpeg_stats",
    "url_canonical_dedup",
    "doc_langid",
    "dim_join_enrichment",
    "price_quartiles",
    "min_unit_price_per_part",
    "distinct_part_counts",
    "q17_small_quantity_revenue",
    "q1_pricing_summary",
    "semi_join_big_spenders",
    "top1_order_per_customer",
    "exact_median_price",
    "mode_brand_per_type",
    "group_merge_nations",
    "minmax_bounds_part",
    "scd_as_of_event",
    "gopher_quality_rules",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "embed_ann_lsh",
    "bm25_pruned_retrieval",
    "count_expansion",
    "weighted_geomean_price",
    "q18_large_orders",
    "longtail_price_assembly",
    "dedup_substring_spans",
    "decontaminate_spans",
    "dedup_incremental_batch",
    "embed_ann_ivf_pq",
    "gap_fill_interp_value",
    "embed_knn_classify",
    "dedup_semantic_clusters",
    "train_split_stats",
    "sku_prefix_join",
    "q8_national_market_share",
    "sig_fig_prices",
    "unit_conversions",
    "extract_brand_number",
    "q9_product_type_profit",
    "q16_parts_supplier",
    "q12_priority_shipmode",
    "q19_discounted_revenue",
    "pack_sequences_docs",
    "asof_latest_event_value",
    "benchmark_catalog_stats",
]
REGISTRY = {
    n: REGISTRY[n]
    for n in (*_PRIORITY,
              *[k for k in REGISTRY if k not in _PRIORITY and k not in _TAIL],
              *_TAIL)
}
