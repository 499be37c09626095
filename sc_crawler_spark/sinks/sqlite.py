"""SQLite publish sink (SURVEY.md §2.2 K1/K5; reference
insert.py:115-173, cli.py:242-279).

The reference's published artifact is one SQLite file written with
chunked ``INSERT ... ON CONFLICT DO UPDATE`` statements (100 rows per
statement to stay under SQLite's variable limit). SQLite is a
single-writer store, so this is inherently a driver-side sink: rows
stream off the cluster via ``toLocalIterator`` (one partition in memory
at a time — executors never block on the writer, and the driver never
holds the full table).

Scale note: at 100 TB the SILVER tables stay in parquet/Delta on the
lake; what gets published to SQLite is the standardized CURRENT-STATE
catalog (the reference's whole artifact is ~a few GB — catalog-sized,
not fact-sized), so a streamed single-writer publish is the right shape,
not a bottleneck.
"""

from __future__ import annotations

import sqlite3
from datetime import datetime, timezone
from itertools import islice

from pyspark.sql import DataFrame

from .dialect import SQLITE, Dialect, create_table_sql, quote_ident, upsert_sql

CHUNK = 100  # reference insert.py:150 — "too many SQL variables" guard


def _chunks(it, n):
    while chunk := list(islice(it, n)):
        yield chunk


def stream_upsert(con, df: DataFrame, name: str, pks: list[str],
                  dialect: Dialect = SQLITE,
                  iso_temporals: bool = True) -> int:
    """K1 core — chunked bulk upsert over any DB-API connection:
    INSERT .. ON CONFLICT(pks) DO UPDATE of every non-PK column
    (insert.py:151-161), ``CHUNK`` rows per executemany.

    Arrays/structs are serialized to JSON strings upstream (the caller
    projects them with ``to_json``); this writer handles scalars.
    """
    con.execute(create_table_sql(dialect, name, df, pks))
    if not pks:
        # no conflict target -> plain INSERTs would duplicate on
        # re-publish; PK-less tables (audit trails) refresh wholesale
        con.execute(f"DELETE FROM {quote_ident(name)}")
    cols = [c for c, _ in df.dtypes]
    sql = upsert_sql(dialect, name, cols, pks)
    # datetime/date objects go through sqlite3's default adapters, which
    # are deprecated since Python 3.12 — publish ISO-8601 text instead.
    # (PostgreSQL drivers adapt datetime natively: iso_temporals=False.)
    temporal = [i for i, (_, t) in enumerate(df.dtypes)
                if t in ("date", "timestamp", "timestamp_ntz")] \
        if iso_temporals else []

    def _vals(row):
        vals = list(row)
        for i in temporal:
            if vals[i] is not None:
                vals[i] = str(vals[i])  # ISO-8601 for both datetime and date
        return tuple(vals)

    n = 0
    # toLocalIterator: streams one partition at a time to the driver
    for chunk in _chunks((_vals(row) for row in df.toLocalIterator()), CHUNK):
        con.executemany(sql, chunk)
        n += len(chunk)
    con.commit()
    return n


def publish_table(con: sqlite3.Connection, df: DataFrame, name: str,
                  pks: list[str]) -> int:
    """K1 — the SQLite face of :func:`stream_upsert`."""
    return stream_upsert(con, df, name, pks, dialect=SQLITE)


def publish_lake(tables: dict[str, tuple[DataFrame, list[str]]],
                 path: str, version: str = "0.1.0",
                 extra_metadata: dict[str, str] | None = None) -> dict[str, int]:
    """Publish a dict of ``name -> (df, pks)`` into one SQLite file, then
    write the ``_metadata`` KV table LAST (cli.py:242-279 ordering — a
    reader seeing ``published_at`` knows the data tables are complete)."""
    con = sqlite3.connect(path)
    try:
        counts = {}
        for name, (df, pks) in tables.items():
            counts[name] = publish_table(con, df, name, pks)
        con.execute(
            'CREATE TABLE IF NOT EXISTS "_metadata" '
            "(key TEXT PRIMARY KEY, value TEXT)"
        )
        meta = {
            "sc_crawler_version": version,
            "published_at": str(datetime.now(timezone.utc)),
            **(extra_metadata or {}),
        }
        con.executemany(
            'INSERT INTO "_metadata" (key, value) VALUES (?, ?) '
            "ON CONFLICT (key) DO UPDATE SET value=excluded.value",
            list(meta.items()),
        )
        con.commit()
        return counts
    finally:
        con.close()
