"""PostgreSQL publish sink (reference insert.py:157-161: the bulk-insert
cycle upserts into PostgreSQL with the same ON CONFLICT statements as
SQLite, chunked identically).

Same streamed single-writer shape as :mod:`.sqlite` — rows come off the
cluster via ``toLocalIterator`` and go through
:func:`..sinks.sqlite.stream_upsert` with the POSTGRES dialect (``%s``
paramstyle, PG type map, JSONB for nested columns). The driver library
(psycopg2 / psycopg) is optional in this container, so the connection is
injected: pass any DB-API connection — :func:`connect` builds one from a
DSN when a driver is importable.

On a real deployment the firehose path for fact-scale tables is Spark's
JDBC writer straight from executors; this sink is for the reference's
catalog-sized publish artifact where upsert semantics (not raw
throughput) are the contract.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame

from .dialect import COCKROACH, POSTGRES, Dialect
from .sqlite import stream_upsert


class _CursorConn:
    """Adapt a DB-API connection (cursor-style, e.g. psycopg2) to the
    sqlite3-style execute/executemany/commit surface stream_upsert uses."""

    def __init__(self, con):
        self._con = con

    def execute(self, sql, params=None):
        with self._con.cursor() as cur:
            cur.execute(sql, params or ())

    def executemany(self, sql, seq):
        with self._con.cursor() as cur:
            cur.executemany(sql, seq)

    def commit(self):
        self._con.commit()


def connect(dsn: str):
    """Open a PostgreSQL DB-API connection from a DSN, trying psycopg
    (v3) then psycopg2. Raises ImportError when neither driver exists."""
    try:
        import psycopg  # noqa: F401 — optional driver
        return psycopg.connect(dsn)
    except ImportError:
        import psycopg2  # noqa: F401 — optional driver
        return psycopg2.connect(dsn)


def publish_table_pg(con, df: DataFrame, name: str, pks: list[str],
                     dialect: Dialect = POSTGRES) -> int:
    """K1 (PostgreSQL family) — chunked ON CONFLICT upsert; ``con`` is
    any DB-API connection (cursor-style adapted automatically)."""
    target = con if hasattr(con, "executemany") else _CursorConn(con)
    return stream_upsert(target, df, name, pks, dialect=dialect,
                         iso_temporals=False)


def publish_table_cockroach(con, df: DataFrame, name: str,
                            pks: list[str]) -> int:
    """K1 (CockroachDB — reference folds it into the PG path,
    utils.py:155): same streamed chunk cycle over the PG wire protocol,
    but the statement is CRDB's native ``UPSERT INTO``."""
    return publish_table_pg(con, df, name, pks, dialect=COCKROACH)


def publish_lake_pg(tables: dict[str, tuple[DataFrame, list[str]]],
                    con, version: str = "0.1.0",
                    extra_metadata: dict[str, str] | None = None,
                    dialect: Dialect = POSTGRES) -> dict[str, int]:
    """Publish ``name -> (df, pks)`` into PostgreSQL/CockroachDB,
    ``_metadata`` KV written LAST (K5 ordering, cli.py:242-279)."""
    target = con if hasattr(con, "executemany") else _CursorConn(con)
    counts = {}
    for name, (df, pks) in tables.items():
        counts[name] = stream_upsert(target, df, name, pks,
                                     dialect=dialect, iso_temporals=False)
    target.execute(
        'CREATE TABLE IF NOT EXISTS "_metadata" '
        "(key TEXT PRIMARY KEY, value TEXT)"
    )
    meta = {
        "sc_crawler_version": version,
        "published_at": str(datetime.now(timezone.utc)),
        **(extra_metadata or {}),
    }
    target.executemany(
        'INSERT INTO "_metadata" (key, value) VALUES (%s, %s) '
        "ON CONFLICT (key) DO UPDATE SET value=excluded.value",
        list(meta.items()),
    )
    target.commit()
    return counts
