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


def test_empty_batch_is_a_noop(spark, tmp_path):
    """A zero-row fetch (vendor outage) must not crash on the dataless
    stage read-back, and must leave the table untouched — the
    inactivation sweep is scoped to touched partitions, of which there
    are none."""
    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("aws", 1, "a", "active")],
        "vendor_id string, id int, v string, status string")
    merge_upsert_partitioned(spark, root, base, ["vendor_id", "id"])
    before = sorted(map(tuple, spark.read.parquet(root).collect()))

    empty = base.filter("1=0")
    merge_upsert_partitioned(spark, root, empty, ["vendor_id", "id"])
    after = sorted(map(tuple, spark.read.parquet(root).collect()))
    assert after == before


def test_null_partition_value_refused(spark, tmp_path):
    """NULL never matches isin(): existing null-partition rows would be
    excluded from the merge while the overwrite replaced their
    partition — refused loudly instead."""
    import pytest

    root = str(tmp_path / "t")
    bad = spark.createDataFrame(
        [(None, 1, "a", "active")],
        "vendor_id string, id int, v string, status string")
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert_partitioned(spark, root, bad, ["vendor_id", "id"])


def test_flat_table_at_root_refused(spark, tmp_path):
    """Writing vendor_id=... partition dirs next to an existing FLAT
    parquet table would corrupt the path (conflicting directory
    structures) and silently skip the flat rows in the merge."""
    import pytest

    root = str(tmp_path / "t")
    flat = spark.createDataFrame(
        [("aws", 1, "a", "active")],
        "vendor_id string, id int, v string, status string")
    flat.write.parquet(root)  # legacy non-partitioned layout
    with pytest.raises(ValueError, match="non-partitioned"):
        merge_upsert_partitioned(spark, root, flat, ["vendor_id", "id"])
    # untouched: still readable as the flat table it was
    assert spark.read.parquet(root).count() == 1
