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

# The round driver checks queries in registry order and may cap how many
# it runs (round 1 stopped at 50 of 52). Keep queries that are the SOLE
# oracle evidence for an operator ID at the front; queries whose operator
# IDs have redundant green coverage elsewhere go last.
_PRIORITY = [
    "config_tolerance_filter",     # P6 — skipped in round 1 (position 51)
    "standardize_part_names",      # P9 — skipped in round 1 (position 52)
    "workload_profiles_catalog",   # new: real catalog end-to-end
    "workload_catalog_breakdown",  # new: per-component breakdown
    "dedup_embed_cosine",          # new: embedding-cosine near-dup tier
    "training_set_select",         # new: dedup+quality+langid composition
    "dedup_boilerplate_chunks",    # new: CCNet-style chunk boilerplate
    "asof_latest_event_value",     # new: as-of join operator
    "range_join_event_window",     # new: bucketed range join
    "region_dims_rollup",          # r3: S12 full region+country catalogs
    "vendor_compliance_matrix",    # r3: S12 vendor/compliance catalogs
    "benchmark_catalog_stats",     # r3: S12 full benchmark catalog
    "spot_price_asof",             # r3: T4 reported-timestamp keep-last
    "media_metadata_extract",      # r3: real PNG/WAV header decode loop
]
# Redundant coverage — their operator IDs have other green oracle rows
# (J5/J6 anti: hash_diff_sync; W2/A4 keep-last: scd2_latest_event,
# first_version_orders; E1-E4: sync unions; scan-agg: q1/q3/q5).
_TAIL = [
    "anti_join_no_orders",
    "keep_last_dedup_lineitem",
    "except_building_buyers",
    "argmax_customer_per_nation",   # W1 covered by top1_order_per_customer
    "dim_join_enrichment",          # J1 covered by every broadcast join
    "price_quartiles",              # percentile covered by exact_median_price
    "min_unit_price_per_part",      # min-per-group covered by minmax/top1
    "distinct_part_counts",         # A14 also covered by operator tests
    "q17_small_quantity_revenue",
]
REGISTRY = {
    n: REGISTRY[n]
    for n in (*_PRIORITY,
              *[k for k in REGISTRY if k not in _PRIORITY and k not in _TAIL],
              *_TAIL)
}
