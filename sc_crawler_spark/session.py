"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness parity with the DuckDB oracle
(UTC session timezone, ANSI off so casts behave like the reference's
permissive Python coercions) and for scale (AQE with skew-join handling,
partition coalescing, broadcast-join threshold).

On a real cluster the same builder is used — only ``master`` and the
shuffle-partition count change (set ``spark.sql.shuffle.partitions`` to
~2-3x total executor cores; AQE coalesces the excess at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sc-crawler-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              prefer_shuffled_hash: bool | None = None,
              task_max_failures: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the driver's
    bench harness controls core count.

    ``prefer_shuffled_hash`` opts into shuffled-hash over sort-merge for
    fact-fact joins (``spark.sql.join.preferSortMergeJoin=false``):
    skips two O(n log n) sorts — measured -8% (q3) to -19% (q5) at the
    64x scale block. TRADEOFF, stated honestly: the size gate runs on
    STATIC estimates, and SHJ's build-side map does not spill the way
    SMJ does — a badly under-estimated build side can OOM where SMJ
    would have spilled through; AQE skew-join only splits skewed
    partitions, not uniformly-large ones. So the LIBRARY default stays
    Spark's safe default (sort-merge): only the bench/test profile and
    callers that know their build sides are bounded (this engine's
    fact-fact joins reduce each side by broadcast dims first, see
    queries/tpch.py q5) turn it on — via this parameter or
    ``SPARK_GRAFT_PREFER_SHJ=1``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Task retries in LOCAL mode are set through the master string
    # (local[N, F]) — spark.task.maxFailures only applies on a real
    # cluster scheduler. Default stays Spark's local[N] (fail fast, the
    # right call for unit tests); the bench profile passes 4 so one
    # co-tenant-induced lost task cannot abort a long measurement (the
    # r12 dedup_minhash_lsh 64x failure mode). On a 1000-executor
    # cluster the equivalent is the spark.task.maxFailures=4 DEFAULT —
    # local[N]'s 1 is the odd one out, not the production setting.
    if master is None:
        master = (f"local[{cpus},{task_max_failures}]"
                  if task_max_failures and task_max_failures > 1
                  else f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    if prefer_shuffled_hash is None:
        prefer_shuffled_hash = (
            os.environ.get("SPARK_GRAFT_PREFER_SHJ", "0") == "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-planning — coalesce small shuffle partitions,
        # convert to broadcast joins when a side turns out small, split
        # skewed partitions. Essential at 100 TB, harmless at sf0.01.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas-UDF path (vectorized Python boundary).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Push bare MIN/MAX/COUNT into the parquet footer stats (off by
        # default). Narrow applicability (no filter/groupBy), but it
        # turns the engine's frequent bare .count() probes — snapshot
        # row counts, version listings, rows-only checks — into
        # footer-metadata reads instead of full scans.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Oracle parity: DuckDB reads parquet timestamps as naive/UTC.
        .config("spark.sql.session.timeZone", "UTC")
        # The reference tolerates permissive coercions (pydantic fills
        # defaults); ANSI-strict casts would fail rows instead.
        .config("spark.sql.ansi.enabled", "false")
        # The lake's events table carries TIMESTAMP(NANOS) parquet columns
        # (pandas-written); read them as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Small dims (region/nation/vendor catalogs) should always
        # broadcast; 64 MiB covers every dimension table at any SF.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Shuffled-hash vs sort-merge: opt-in only — see the docstring.
        # The library default is Spark's safe default (SMJ, spillable).
        .config("spark.sql.join.preferSortMergeJoin",
                "false" if prefer_shuffled_hash else "true")
        .config("spark.ui.enabled", "false")
        # PySpark 4 wraps every DataFrame/Column API call with a
        # call-site capture that costs ~4 extra py4j roundtrips per call
        # (errors/utils.py _with_origin). Plan *construction* is part of
        # every cold query, so turn the debug niceties off: builds get
        # 2-4x cheaper and error messages lose only the Python call-site
        # line, not the error itself.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    return builder.getOrCreate()
