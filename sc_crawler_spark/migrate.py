"""Lake schema versioning + migrations (reference cli.py:124-239,
432-442: Alembic revision gates and ``schemas upgrade``).

The reference stamps every database with its Alembic revision and
refuses to sync/update across mismatched revisions; here the lake root
carries a ``_SCHEMA_VERSION`` stamp file and ``MIGRATIONS`` is the
declarative revision history: for each new version, the columns it added
per table with their backfill defaults. Upgrading a lake folds the
missing revisions into each table snapshot (pure column-adds — O(scan)
per table, no shuffle) and re-stamps.

A lake with no stamp predates versioning and reads as version 1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Bump on every change to schemas.py; record the delta in MIGRATIONS.
SCHEMA_VERSION = 3

STAMP = "_SCHEMA_VERSION"

# version -> table -> [(column, sql_type, default_expr_builder)]
# default builders are lazy (Column constructors need a live session) and
# may reference existing columns of the same table.
MIGRATIONS: dict[int, dict[str, list[tuple[str, str, object]]]] = {
    # r4: database gains the reference's naming/crosslink columns
    # (table_bases.py:892-905), database_storage its display columns
    # (table_bases.py:1005-1008).
    2: {
        "database": [
            ("name", "string", lambda: F.col("database_id")),
            ("api_reference", "string", lambda: F.col("database_id")),
            ("display_name", "string", lambda: F.col("database_id")),
            ("description", "string", lambda: F.lit(None)),
            ("server_id", "string", lambda: F.lit(None)),
            ("support_level", "string", lambda: F.lit(None)),
        ],
        "database_storage": [
            ("name", "string", lambda: F.col("database_storage_id")),
            ("description", "string", lambda: F.lit(None)),
        ],
    },
    # r7: cmd_pull moved region to the canonical (vendor_id, region_id)
    # PK; lakes pulled by the older code hold a narrow region snapshot
    # (no vendor_id) under the same v2 stamp. Backfill to 'aws' — the
    # only vendor the old pull ever seeded — so `schemas upgrade`
    # repairs them instead of merge_upsert failing on a missing join
    # column.
    3: {
        "region": [
            ("vendor_id", "string", lambda: F.lit("aws")),
        ],
    },
}


class SchemaVersionMismatch(RuntimeError):
    pass


def lake_version(lake: str) -> int:
    p = os.path.join(lake, STAMP)
    if os.path.exists(p):
        with open(p) as fh:
            return int(fh.read().strip())
    return 1  # pre-versioning lake


def stamp_lake(lake: str, version: int = SCHEMA_VERSION) -> None:
    os.makedirs(lake, exist_ok=True)
    tmp = os.path.join(lake, STAMP + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(lake, STAMP))


def check_lake(lake: str, *, context: str) -> None:
    """Refuse to operate on a lake whose stamp trails the code's schema
    (the reference's pre-flight revision check, cli.py:432-442)."""
    v = lake_version(lake)
    if v != SCHEMA_VERSION:
        raise SchemaVersionMismatch(
            f"{context}: lake {lake!r} is at schema version {v}, code is at "
            f"{SCHEMA_VERSION} — run `schemas upgrade --lake {lake}` first"
        )


def upgrade_table(df: DataFrame, table: str, from_version: int) -> DataFrame:
    """Fold every missing revision's column-adds into ``df``. Columns
    already present are left untouched (idempotent)."""
    for v in range(from_version + 1, SCHEMA_VERSION + 1):
        for col, sql_type, default in MIGRATIONS.get(v, {}).get(table, []):
            if col not in df.columns:
                df = df.withColumn(col, default().cast(sql_type))
    return df


def downgrade_table(df: DataFrame, table: str, from_version: int,
                    to_version: int) -> DataFrame:
    """Drop every column added by revisions (``to_version``,
    ``from_version``] — the inverse of :func:`upgrade_table`. Column
    adds are the only migration kind, so dropping them is a complete
    reversal (upgrade -> downgrade -> upgrade round-trips)."""
    for v in range(from_version, to_version, -1):
        drop = [col for col, _t, _d in MIGRATIONS.get(v, {}).get(table, [])
                if col in df.columns]
        if drop:
            df = df.drop(*drop)
    return df


def downgrade_lake(spark: SparkSession, lake: str,
                   to_version: int) -> dict[str, list[str]]:
    """``schemas downgrade`` (reference cli.py:195-206: alembic
    downgrade to a target revision): strip each table snapshot of the
    columns its post-``to_version`` migrations added and re-stamp.
    Returns {table: [dropped columns]} for reporting."""
    from .sinks.snapshot import read_snapshot, write_snapshot

    v = lake_version(lake)
    if to_version < 1:
        raise ValueError(f"cannot downgrade below version 1 (got {to_version})")
    dropped: dict[str, list[str]] = {}
    if to_version >= v:
        stamp_lake(lake, min(to_version, v))
        return dropped
    from .schemas import PRIMARY_KEYS

    tables = sorted(
        d for d in os.listdir(lake)
        if os.path.isdir(os.path.join(lake, d)) and not d.startswith("_")
    )
    # Pass 1 — validate EVERYTHING before writing anything, so a
    # refused table never leaves the lake half-downgraded under the
    # old stamp. Dropping a PRIMARY KEY component can collapse distinct
    # keys (e.g. (aws, us-east-1) and (azure, us-east-1) become
    # duplicate region rows), after which a re-upgrade would backfill
    # ONE constant vendor and silently corrupt every later
    # vendor-scoped merge. Column drops of non-key data are ordinary
    # lossy alembic downgrades; key collapses are refused.
    pending: list[tuple[str, DataFrame, list[str]]] = []
    for t in tables:
        df = read_snapshot(spark, os.path.join(lake, t))
        before = set(df.columns)
        downgraded = downgrade_table(df, t, v, to_version)
        gone = sorted(before - set(downgraded.columns))
        if not gone:
            continue
        pk = PRIMARY_KEYS.get(t, [])
        pk_gone = [c for c in gone if c in pk]
        if pk_gone:
            remaining = [c for c in pk if c in downgraded.columns]
            if remaining:
                n_rows = downgraded.count()
                n_keys = downgraded.select(*remaining).distinct().count()
                if n_keys < n_rows:
                    raise ValueError(
                        f"downgrade to v{to_version} would drop primary-"
                        f"key column(s) {pk_gone} of {t!r} and collapse "
                        f"{n_rows - n_keys} distinct key(s) into "
                        f"duplicates — the data holds values a re-"
                        f"upgrade's constant backfill cannot restore. "
                        f"Export or delete the non-default rows first.")
        pending.append((t, downgraded, gone))
    # Pass 2 — apply
    for t, downgraded, gone in pending:
        write_snapshot(spark, downgraded, os.path.join(lake, t))
        dropped[t] = gone
    stamp_lake(lake, to_version)
    return dropped


def upgrade_lake(spark: SparkSession, lake: str) -> dict[str, list[str]]:
    """Apply pending migrations to every table snapshot and re-stamp.
    Returns {table: [added columns]} for reporting."""
    from .sinks.snapshot import read_snapshot, write_snapshot

    v = lake_version(lake)
    added: dict[str, list[str]] = {}
    if v >= SCHEMA_VERSION:
        stamp_lake(lake, SCHEMA_VERSION)
        return added
    tables = sorted(
        d for d in os.listdir(lake)
        if os.path.isdir(os.path.join(lake, d)) and not d.startswith("_")
    )
    for t in tables:
        df = read_snapshot(spark, os.path.join(lake, t))
        before = set(df.columns)
        upgraded = upgrade_table(df, t, v)
        new_cols = [c for c in upgraded.columns if c not in before]
        if new_cols:
            write_snapshot(spark, upgraded, os.path.join(lake, t))
            added[t] = new_cols
    stamp_lake(lake, SCHEMA_VERSION)
    return added
