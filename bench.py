#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() forces the full plan; the
driver-side result stays tiny so timing measures the engine, not IO to
the client).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sc_crawler_spark.queries import REGISTRY  # noqa: E402
from sc_crawler_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family — scan-agg, join-agg, windows,
# sync, sessionization, dedup (LSH), similarity, composite scoring.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top1_order_per_customer",
    "exact_median_price",
    "hash_diff_sync",
    "merge_upsert_lifecycle",
    "session_counts",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "embed_cosine_topk",
    "workload_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sc-crawler-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm every headline plan once at the smallest SF: whole-stage
    # codegen compilation + JVM JIT are one-time costs (~7 s across the
    # suite) that would otherwise be attributed to whichever query runs
    # first. Steady-state timing measures the engine, not the JIT.
    warm_dir = sf_dir.replace("sf0.1", "sf0.001") if "sf0.1" in sf_dir else sf_dir
    for name in HEADLINE:
        REGISTRY[name][0](spark, warm_dir).count()

    # Best-of-3 per query: the box runs concurrent processes, so a single
    # sample carries multi-second scheduler/GC noise; the minimum is the
    # engine's steady-state cost (same protocol as DuckDB's public
    # benchmark harness).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name][0]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
