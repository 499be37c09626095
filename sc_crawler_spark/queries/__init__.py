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

from . import dims, domain, extra, lifecycle, pipeline, tpch

REGISTRY: dict[str, tuple] = {}
for mod in (tpch, lifecycle, pipeline, domain, extra, dims):
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
_PRIORITY = [
    # --- new this round (never driver-checked) ---
    "region_dims_rollup",          # r3: S12 full region+country catalogs
    "vendor_compliance_matrix",    # r3: S12 vendor/compliance catalogs
    "benchmark_catalog_stats",     # r3: S12 full benchmark catalog
    "spot_price_asof",             # r3: T4 reported-timestamp keep-last
    "media_metadata_extract",      # r3: real PNG/WAV header decode loop
    # --- tail of r2 (outside the cap that round; r1-green + pytest) ---
    "anti_join_no_orders",
    "keep_last_dedup_lineitem",
    "except_building_buyers",
    "argmax_customer_per_nation",
    "dim_join_enrichment",
    "price_quartiles",
    "min_unit_price_per_part",
    "distinct_part_counts",
    "q17_small_quantity_revenue",
]
# Freshest driver evidence (green rows in CORRECTNESS_r02.json) — these
# sit out this round's 50-query window and are covered by the pytest
# oracle re-check until they rotate forward again.
_TAIL = [
    "ecpus_scalability",
    "shuffled_sample_orders",
    "sku_prefix_join",
    "first_version_orders",
    "heavy_hitter_users",
    "config_tolerance_filter",
    "standardize_part_names",
    "workload_profiles_catalog",
    "workload_catalog_breakdown",
    "dedup_embed_cosine",
    "training_set_select",
    "dedup_boilerplate_chunks",
    "asof_latest_event_value",
    "range_join_event_window",
]
REGISTRY = {
    n: REGISTRY[n]
    for n in (*_PRIORITY,
              *[k for k in REGISTRY if k not in _PRIORITY and k not in _TAIL],
              *_TAIL)
}
