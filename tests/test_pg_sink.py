"""PostgreSQL publish dialect (reference insert.py:157-161): same
chunked ON CONFLICT upsert cycle as SQLite, switched on the dialect.

No PG server ships in this container, so coverage is two-pronged:
a recording DB-API stub asserts the exact statement stream (DDL, %s
paramstyle, chunking, metadata-last ordering), and DuckDB — whose SQL
front end accepts PostgreSQL's ON CONFLICT grammar and type names —
executes the generated statements for real to prove they are valid,
upserting SQL, not just strings.
"""

from __future__ import annotations

import duckdb

from sc_crawler_spark.sinks.dialect import POSTGRES, create_table_sql, upsert_sql
from sc_crawler_spark.sinks.postgres import publish_lake_pg, publish_table_pg


class _RecordingCursor:
    def __init__(self, log):
        self.log = log

    def execute(self, sql, params=None):
        self.log.append(("execute", sql, params))

    def executemany(self, sql, seq):
        self.log.append(("executemany", sql, list(seq)))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _RecordingConn:
    """Cursor-style DB-API connection (psycopg2 shape)."""

    def __init__(self):
        self.log = []

    def cursor(self):
        return _RecordingCursor(self.log)

    def commit(self):
        self.log.append(("commit", None, None))


def _mk(spark, n=5):
    return spark.createDataFrame(
        [("aws", f"s{i}", float(i), i % 2 == 0) for i in range(n)],
        "vendor_id string, server_id string, price double, spot boolean")


def test_pg_statement_stream(spark):
    con = _RecordingConn()
    n = publish_table_pg(con, _mk(spark, 250), "server_price",
                         pks=["vendor_id", "server_id"])
    assert n == 250
    kinds = [k for k, _, _ in con.log]
    assert kinds == ["execute", "executemany", "executemany", "executemany",
                     "commit"]  # DDL + ceil(250/100) chunks + commit
    ddl = con.log[0][1]
    assert '"price" DOUBLE PRECISION' in ddl
    assert '"spot" BOOLEAN' in ddl
    assert 'PRIMARY KEY ("vendor_id", "server_id")' in ddl
    dml, rows = con.log[1][1], con.log[1][2]
    assert dml.count("%s") == 4 and "?" not in dml
    assert 'ON CONFLICT ("vendor_id", "server_id") DO UPDATE SET' in dml
    assert '"price"=excluded."price"' in dml
    assert '"vendor_id"=excluded' not in dml  # PK never in the SET list
    assert len(rows) == 100 and len(con.log[3][2]) == 50


def test_pg_lake_publish_writes_metadata_last(spark):
    con = _RecordingConn()
    counts = publish_lake_pg(
        {"server": (_mk(spark, 3), ["vendor_id", "server_id"])},
        con, version="9.9.9")
    assert counts == {"server": 3}
    meta_stmts = [e for e in con.log if "_metadata" in (e[1] or "")]
    assert meta_stmts, "metadata written"
    last_write = max(i for i, e in enumerate(con.log)
                     if e[0] in ("execute", "executemany"))
    assert "_metadata" in con.log[last_write][1]
    kv = dict(next(e[2] for e in con.log
                   if e[0] == "executemany" and "_metadata" in e[1]))
    assert kv["sc_crawler_version"] == "9.9.9"


def test_pg_dialect_statements_execute_on_a_real_engine(spark):
    """DuckDB speaks the PG grammar: run the generated DDL + upsert
    twice (second pass = conflict path) and check the merged state."""
    df = _mk(spark, 4)
    cols = [c for c, _ in df.dtypes]
    pks = ["vendor_id", "server_id"]
    con = duckdb.connect()
    con.execute(create_table_sql(POSTGRES, "server_price", df, pks))
    dml = upsert_sql(POSTGRES, "server_price", cols, pks).replace("%s", "?")
    con.executemany(dml, [tuple(r) for r in df.collect()])
    # conflicting re-insert with changed prices must UPDATE, not append
    con.executemany(dml, [("aws", "s0", 99.0, False), ("aws", "s9", 9.0, True)])
    got = {(v, s): (p, b) for v, s, p, b in
           con.execute("SELECT * FROM server_price ORDER BY 2").fetchall()}
    assert len(got) == 5
    assert got[("aws", "s0")] == (99.0, False)
    assert got[("aws", "s9")] == (9.0, True)
