"""Schema-version stamps + migrations (reference cli.py:124-239,
432-442: revision gates and `schemas upgrade`)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sc_crawler_spark import cli, migrate
from sc_crawler_spark.sinks.snapshot import read_snapshot, write_snapshot


def _mini_lake(spark, root, version=None):
    """A lake with a v1-shaped database table (pre-migration columns)."""
    df = spark.createDataFrame(
        [("aws", "db.m5.large", "postgresql", "active")],
        "vendor_id string, database_id string, engine string, status string",
    ).withColumn("observed_at", F.current_timestamp())
    write_snapshot(spark, df, os.path.join(root, "database"))
    if version is not None:
        migrate.stamp_lake(root, version)


def test_unstamped_lake_reads_as_version_1(tmp_path):
    assert migrate.lake_version(str(tmp_path)) == 1
    migrate.stamp_lake(str(tmp_path))
    assert migrate.lake_version(str(tmp_path)) == migrate.SCHEMA_VERSION


def test_sync_refuses_mismatched_schema_versions(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    _mini_lake(spark, src, version=migrate.SCHEMA_VERSION)
    _mini_lake(spark, tgt, version=1)   # target lags behind the code
    with pytest.raises(migrate.SchemaVersionMismatch, match="sync target"):
        cli.cmd_sync(spark, src, tgt, "database")
    # an unstamped (legacy) source is version 1 and refused too
    os.remove(os.path.join(src, migrate.STAMP))
    with pytest.raises(migrate.SchemaVersionMismatch, match="sync source"):
        cli.cmd_sync(spark, src, tgt, "database")


def test_writers_refuse_stale_populated_lake(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _mini_lake(spark, lake, version=1)
    with pytest.raises(migrate.SchemaVersionMismatch, match="write"):
        cli.cmd_pull(spark, lake)


def test_upgrade_adds_columns_with_defaults_and_stamps(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _mini_lake(spark, lake)             # unstamped -> version 1
    added = migrate.upgrade_lake(spark, lake)
    assert "name" in added["database"] and "server_id" in added["database"]
    assert migrate.lake_version(lake) == migrate.SCHEMA_VERSION

    db = read_snapshot(spark, os.path.join(lake, "database")).collect()[0]
    assert db["name"] == "db.m5.large"          # backfill from database_id
    assert db["display_name"] == "db.m5.large"
    assert db["server_id"] is None              # nullable default
    assert db["engine"] == "postgresql"         # untouched

    # idempotent: a second upgrade adds nothing and keeps the stamp
    assert migrate.upgrade_lake(spark, lake) == {}

    # upgraded lakes sync cleanly again
    tgt = str(tmp_path / "tgt")
    _mini_lake(spark, tgt)
    migrate.upgrade_lake(spark, tgt)
    cli.cmd_sync(spark, lake, tgt, "database")
    assert read_snapshot(spark, os.path.join(tgt, "database")).count() == 1


def _table_digest(spark, lake, table):
    df = read_snapshot(spark, os.path.join(lake, table))
    cols = sorted(c for c in df.columns if c != "observed_at")
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    ), cols


def test_downgrade_reverses_upgrade_round_trip(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _mini_lake(spark, lake)             # unstamped -> version 1
    before, before_cols = _table_digest(spark, lake, "database")

    migrate.upgrade_lake(spark, lake)
    assert migrate.lake_version(lake) == migrate.SCHEMA_VERSION

    # downgrade strips exactly the migration's column-adds and re-stamps
    dropped = migrate.downgrade_lake(spark, lake, 1)
    assert migrate.lake_version(lake) == 1
    assert set(dropped["database"]) == {
        c for c, _t, _d in migrate.MIGRATIONS[2]["database"]}
    after, after_cols = _table_digest(spark, lake, "database")
    assert (after, after_cols) == (before, before_cols)

    # a second downgrade is a no-op; upgrade works again afterwards
    assert migrate.downgrade_lake(spark, lake, 1) == {}
    assert "name" in migrate.upgrade_lake(spark, lake)["database"]
    assert migrate.lake_version(lake) == migrate.SCHEMA_VERSION


def test_schemas_create_prints_ddl(spark, capsys):
    """`schemas create` (reference cli.py:125-163): print the full
    CREATE TABLE surface in a chosen dialect, touching nothing."""
    from sc_crawler_spark import schemas

    cli.cmd_schemas(spark, "create", ".", dialect="postgres")
    out = capsys.readouterr().out
    assert out.count("CREATE TABLE IF NOT EXISTS") == len(schemas.TABLES)
    assert '"server"' in out
    assert 'PRIMARY KEY ("vendor_id", "server_id")' in out
    assert "JSONB" in out          # nested structs -> dialect default
    # SCD form: PKs gain observed_at (tables_scd.py:45-53)
    cli.cmd_schemas(spark, "create", ".", dialect="sqlite", scd=True)
    out2 = capsys.readouterr().out
    assert 'PRIMARY KEY ("vendor_id", "server_id", "observed_at")' in out2


def test_schemas_autogenerate_scaffold(spark, tmp_path, capsys):
    """`schemas autogenerate` (reference cli.py:225-241): diff a lake
    against the code's schemas and print the MIGRATIONS scaffold."""
    from sc_crawler_spark import schemas

    lake = str(tmp_path / "lake")
    full = spark.createDataFrame([], schemas.TABLES["country"])
    write_snapshot(spark, full, os.path.join(lake, "country"))
    cli.cmd_schemas(spark, "autogenerate", lake)
    assert '"revision_needed": false' in capsys.readouterr().out

    partial = full.drop("continent")
    write_snapshot(spark, partial, os.path.join(lake, "country"))
    cli.cmd_schemas(spark, "autogenerate", lake)
    out = capsys.readouterr().out
    assert '"revision_needed": true' in out
    assert f'"next_version": {migrate.SCHEMA_VERSION + 1}' in out
    assert "'continent'" in out


def test_upgrade_backfills_legacy_narrow_region(spark, tmp_path):
    """Lakes pulled before region moved to the canonical (vendor_id,
    region_id) PK hold a region snapshot WITHOUT vendor_id under a v2
    stamp; `schemas upgrade` (v3) must backfill vendor_id='aws' (the
    only vendor the old pull seeded) so cmd_pull's merge on
    (vendor_id, region_id) works again."""
    lake = str(tmp_path / "lake")
    narrow = spark.createDataFrame(
        [("legacy-region-1", "Legacy DC", "active")],
        "region_id string, name string, status string",
    ).withColumn("observed_at", F.current_timestamp())
    write_snapshot(spark, narrow, os.path.join(lake, "region"))
    migrate.stamp_lake(lake, 2)

    with pytest.raises(migrate.SchemaVersionMismatch, match="write"):
        cli.cmd_pull(spark, lake)   # refused until upgraded

    added = migrate.upgrade_lake(spark, lake)
    assert added["region"] == ["vendor_id"]
    row = read_snapshot(spark, os.path.join(lake, "region")).collect()[0]
    assert row["vendor_id"] == "aws"
    # a region written by the NEW pull already has vendor_id: idempotent
    assert migrate.upgrade_lake(spark, lake) == {}

    # the repaired lake pulls cleanly: the canonical merge joins on
    # (vendor_id, region_id) against the backfilled snapshot, and the
    # legacy row (not in the aws canon) flips to inactive instead of
    # crashing the merge
    cli.cmd_pull(spark, lake)
    region = read_snapshot(spark, os.path.join(lake, "region"))
    legacy = region.filter("region_id = 'legacy-region-1'")
    assert legacy.count() == 1
    assert legacy.collect()[0]["status"] == "inactive"
    assert region.filter("status = 'active'").count() > 0


def test_schemas_lake_flag_required_for_lake_actions(spark):
    """A bare `schemas upgrade`/`stamp` must error, not treat cwd as a
    lake (the old default='.' silently stamped whatever directory the
    command ran in). `create` only prints DDL and needs no lake."""
    for action in ("version", "upgrade", "downgrade", "stamp",
                   "autogenerate"):
        with pytest.raises(SystemExit, match="--lake is required"):
            cli.cmd_schemas(spark, action, None)


def test_downgrade_refuses_pk_collapse(spark, tmp_path):
    """Downgrading region below v3 drops vendor_id — a PRIMARY KEY
    component. With rows from two vendors sharing a region_id, the drop
    would collapse distinct keys (and a later upgrade would backfill
    them all as 'aws', corrupting vendor-scoped merges) — refused.
    A single-vendor lake (no collapse) downgrades fine."""
    lake = str(tmp_path / "multi")
    multi = spark.createDataFrame(
        [("aws", "eastus", "E US", "active"),
         ("azure", "eastus", "East US", "active")],
        "vendor_id string, region_id string, name string, status string",
    ).withColumn("observed_at", F.current_timestamp())
    write_snapshot(spark, multi, os.path.join(lake, "region"))
    migrate.stamp_lake(lake, migrate.SCHEMA_VERSION)
    with pytest.raises(ValueError, match="collapse"):
        migrate.downgrade_lake(spark, lake, 2)
    # refused BEFORE writing: snapshot + stamp untouched
    assert migrate.lake_version(lake) == migrate.SCHEMA_VERSION
    assert "vendor_id" in read_snapshot(
        spark, os.path.join(lake, "region")).columns

    lake2 = str(tmp_path / "single")
    write_snapshot(spark, multi.filter("vendor_id = 'aws'"),
                   os.path.join(lake2, "region"))
    migrate.stamp_lake(lake2, migrate.SCHEMA_VERSION)
    dropped = migrate.downgrade_lake(spark, lake2, 2)
    assert dropped["region"] == ["vendor_id"]


def test_downgrade_rejects_bad_target(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _mini_lake(spark, lake, version=migrate.SCHEMA_VERSION)
    with pytest.raises(ValueError, match="below version 1"):
        migrate.downgrade_lake(spark, lake, 0)
    # downgrading to the current (or higher) version changes nothing
    assert migrate.downgrade_lake(spark, lake, migrate.SCHEMA_VERSION) == {}
    assert migrate.lake_version(lake) == migrate.SCHEMA_VERSION
