"""Incremental MERGE sink: partition-pruned rewrite.

The plain ``merge_upsert`` + ``write_snapshot`` path rewrites the whole
table per pull — correct, but at 100 TB a nightly single-vendor pull
must not rewrite every byte of the lake. This sink stores the table
hive-partitioned on the merge scope column (``vendor_id``) and uses
Spark's dynamic partition overwrite so one pull:

1. reads ONLY the partitions present in the update batch (partition
   pruning — the scan never touches other vendors' files),
2. merges with the reference's inactivate-missing semantics scoped to
   those partitions (tables.py:224-283),
3. overwrites ONLY those partitions
   (``spark.sql.sources.partitionOverwriteMode=dynamic``) — untouched
   partitions' files stay byte-identical on disk.

This is the reference's per-vendor transactional insert
(insert.py:115-173) at lake scale; on Delta/Iceberg the same call is
``MERGE INTO`` with a partition predicate. The merged batch stages to a
sibling directory first because Spark refuses to overwrite a path its
own plan reads — the double-write is bounded by the TOUCHED partitions,
never the lake.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import merge_upsert


def merge_upsert_partitioned(spark: SparkSession, root: str,
                             updates: DataFrame, pks: list[str],
                             partition_col: str = "vendor_id",
                             inactivate_missing: bool = True) -> None:
    """Merge ``updates`` into the partitioned table at ``root``,
    rewriting only the partitions the batch touches."""
    # the partition list is vendor-count-sized (tens), never row-scale
    touched = [r[0] for r in
               updates.select(partition_col).distinct().collect()]
    if not touched:
        # empty fetch (vendor outage): nothing to merge, nothing to
        # inactivate (the sweep is scoped to touched partitions), and a
        # zero-row stage write would leave a dataless parquet dir that
        # the read-back cannot infer a schema from
        return
    if None in touched:
        # NULL never matches isin(): existing null-partition rows would
        # be EXCLUDED from the merge while the dynamic overwrite
        # replaces __HIVE_DEFAULT_PARTITION__ with only the new rows —
        # silent data loss. The scope column is part of the PK; refuse.
        raise ValueError(
            f"merge_upsert_partitioned: updates contain NULL "
            f"{partition_col!r} values — the partition/scope column "
            f"must be non-null")
    if os.path.isdir(root) and any(
            e.endswith(".parquet") and os.path.isfile(os.path.join(root, e))
            for e in os.listdir(root)):
        # an existing FLAT table at root: writing vendor_id=... dirs
        # next to its part files makes the path unreadable
        # (CONFLICTING_DIRECTORY_STRUCTURES) and the flat rows would be
        # silently skipped by the merge gate below
        raise ValueError(
            f"merge_upsert_partitioned: {root!r} holds a non-partitioned "
            f"parquet table — migrate it to the {partition_col}= layout "
            f"first (read + rewrite partitioned), or use merge_upsert + "
            f"write_snapshot")
    merged = updates
    if os.path.isdir(root) and any(
            e.startswith(f"{partition_col}=") for e in os.listdir(root)):
        current = spark.read.parquet(root).filter(
            F.col(partition_col).isin(touched))  # pruned scan
        merged = merge_upsert(
            current, updates.select(*current.columns), pks,
            inactivate_missing=inactivate_missing,
            scope=F.col(partition_col).isin(touched),
        )
    stage = root.rstrip("/") + "_stage"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(stage)
    # Dynamic overwrite scoped to THIS write via the DataFrameWriter
    # option (takes precedence over the session conf and leaks nothing
    # into later writes). NOTE: the final commit is per-partition, not
    # table-atomic — a crash mid-write can leave a touched partition
    # half-rewritten; the staged copy above makes that recoverable by
    # re-running the same merge. Table-atomic semantics are what
    # sinks/snapshot.py provides (at whole-table rewrite cost) and what
    # MERGE INTO on Delta/Iceberg provides at partition granularity.
    (spark.read.parquet(stage)
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(root))
    import shutil
    shutil.rmtree(stage, ignore_errors=True)
