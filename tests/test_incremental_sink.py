"""Partition-pruned incremental MERGE sink: a single-vendor pull must not
rewrite other vendors' files (reference insert.py:115-173 at lake
scale)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sc_crawler_spark.sinks.incremental import merge_upsert_partitioned


def _files(root, vendor):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(root, f"vendor_id={vendor}", "*.parquet"))
    }


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "vendor_id string, server_id string, price double, status string")


def test_untouched_partitions_keep_their_files(spark, tmp_path):
    root = str(tmp_path / "server_price")
    merge_upsert_partitioned(
        spark, root,
        _mk(spark, [("aws", "m5", 1.0, "active"), ("gcp", "n2", 2.0, "active")]),
        pks=["vendor_id", "server_id"])
    gcp_before = _files(root, "gcp")
    assert gcp_before, "gcp partition written"

    # aws-only re-pull: m5 price changes, m6 appears
    merge_upsert_partitioned(
        spark, root,
        _mk(spark, [("aws", "m5", 1.5, "active"), ("aws", "m6", 3.0, "active")]),
        pks=["vendor_id", "server_id"])

    out = spark.read.parquet(root)
    got = {(r.vendor_id, r.server_id): (r.price, r.status)
           for r in out.collect()}
    assert got == {("aws", "m5"): (1.5, "active"),
                   ("aws", "m6"): (3.0, "active"),
                   ("gcp", "n2"): (2.0, "active")}
    # the gcp partition's files were not rewritten — same paths, same mtimes
    assert _files(root, "gcp") == gcp_before


def test_inactivation_stays_inside_touched_partition(spark, tmp_path):
    root = str(tmp_path / "server")
    merge_upsert_partitioned(
        spark, root,
        _mk(spark, [("aws", "m5", 1.0, "active"), ("aws", "c5", 2.0, "active"),
                    ("gcp", "n2", 2.0, "active")]),
        pks=["vendor_id", "server_id"])
    # aws re-pull without c5: c5 inactive, gcp untouched AND still active
    merge_upsert_partitioned(
        spark, root, _mk(spark, [("aws", "m5", 1.0, "active")]),
        pks=["vendor_id", "server_id"])
    status = {(r.vendor_id, r.server_id): r.status
              for r in spark.read.parquet(root).collect()}
    assert status == {("aws", "m5"): "active", ("aws", "c5"): "inactive",
                      ("gcp", "n2"): "active"}


def test_dynamic_overwrite_mode_does_not_leak_into_session(spark, tmp_path):
    """ADVICE r2: the dynamic partitionOverwriteMode is a per-write
    DataFrameWriter option, not a session conf mutation — a later plain
    overwrite in the same session must still replace the WHOLE table."""
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    root = str(tmp_path / "t")
    merge_upsert_partitioned(
        spark, root,
        _mk(spark, [("aws", "m5", 1.0, "active"), ("gcp", "n2", 2.0, "active")]),
        pks=["vendor_id", "server_id"])
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", None) == before

    # a plain partitioned overwrite elsewhere still behaves statically:
    # writing only aws rows wipes the gcp partition too
    other = str(tmp_path / "other")
    _mk(spark, [("aws", "m5", 1.0, "a"), ("gcp", "n2", 2.0, "a")]) \
        .write.partitionBy("vendor_id").parquet(other)
    _mk(spark, [("aws", "m5", 9.0, "a")]) \
        .write.mode("overwrite").partitionBy("vendor_id").parquet(other)
    assert spark.read.parquet(other).select("vendor_id").distinct().count() == 1
