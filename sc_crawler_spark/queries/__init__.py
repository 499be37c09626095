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
    # --- r13 rotation (r12 verdict task 1): the 35 names whose last
    # driver green is CORRECTNESS_r09 HEAD the window (the ledger
    # promise from r12 — computed from the union of r1-r12 driver
    # files: every other name is r11- or r12-fresh). Then the queries
    # NEW in r13 (media_jpeg_color_stats — the 4:2:0 color JPEG tier —
    # doc_quality_lr_train /
    # doc_quality_lr_apply — distributed GD training + bit-exact
    # per-doc inference — bpe_train_merges — distributed BPE
    # tokenizer training, integer-exact oracle — bpe_tokenize_apply —
    # the train->apply composition over the corpus — doc_lm2_perplexity —
    # interpolated bigram LM — dsir_select — DSIR importance
    # resampling (hashed-ngram LM ratio + Gumbel-top-k) — and
    # perplexity_bucket_filter — CCNet head/middle/tail partition with
    # sample-fit tercile cutoffs — doc_ngram_novelty — corpus-unique
    # 3-gram fraction — source_embed_similarity — the centroid-cosine
    # domain map — bigram_pmi_top — PMI collocation mining — and
    # lr_calibration_bins — the trained classifier's reliability
    # diagram — source_token_kl — per-source unigram KL domain shift —
    # and doc_oov_rate — tokenizer-coverage gate vs the top-K corpus
    # vocabulary; first driver evidence for all of them) and the
    # r13-REWRITTEN training_corpus_emit (frontier stage 0 prepended;
    # its oracle recomposed), then the 12 stalest r11 greens to fill
    # the 50-slot window. Everything else
    # rotates to _TAIL (remaining r11 greens first, then the 49
    # r12-fresh names) and stays pytest-oracle-verified every round by
    # tests/test_queries_oracle.py. ---
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
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_type_profit",
    "q16_parts_supplier",
    "q12_priority_shipmode",
    "q19_discounted_revenue",
    "pack_sequences_docs",
    "asof_latest_event_value",
    "benchmark_catalog_stats",
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
    "dsir_select",
    "perplexity_bucket_filter",
    "doc_ngram_novelty",
    "source_embed_similarity",
    "bigram_pmi_top",
    "lr_calibration_bins",
    "source_token_kl",
    "doc_oov_rate",
]
_TAIL = [
    # These five are r13-new but arrived after the 50-slot window
    # filled against the 35-name r9-stale rotation promise
    # (approx_heavy's oracle is also just the exact arm + tolerance
    # flag — the weakest marginal driver check); they rotate FIRST
    # next round and pytest runs their oracles every round meanwhile.
    "approx_heavy_hitters",
    "cluster_balanced_sample",
    "unimax_mixture_weights",
    "dedup_edit_similarity",
    "bm25_retrieval",
    "hybrid_rrf_retrieval",
    "contrastive_triplets",
    "quality_quantile_normalize",
    "doc_quality",
    "doc_token_stats",
    "ecpus_scalability",
    "embed_ann_ivf",
    # displaced from the 50-slot window by the r13-new dsir_select,
    # perplexity_bucket_filter, bpe_tokenize_apply, doc_ngram_novelty
    # and source_embed_similarity; r11-green, re-verified every round
    # by pytest — they rotate forward next round.
    "embed_ann_lsh",
    "embed_cosine_topk",
    "first_version_orders",
    "hash_diff_sync",
    "heavy_hitter_users",
    "json_props_extract",
    "merge_upsert_lifecycle",
    "range_join_event_window",
    "running_user_value",
    "scd2_latest_event",
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
    "approx_median_price",
    "approx_distinct_users",
    "embed_ann_pq",
    "dedup_containment",
    "event_anomaly_zscore",
    "twap_user_value",
    "gap_fill_daily_value",
    "funnel_conversion",
    "cohort_retention",
    "chunk_documents",
    "tfidf_keywords",
    "doc_lm_perplexity",
    "q6_forecast_revenue",
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
]
REGISTRY = {
    n: REGISTRY[n]
    for n in (*_PRIORITY,
              *[k for k in REGISTRY if k not in _PRIORITY and k not in _TAIL],
              *_TAIL)
}
