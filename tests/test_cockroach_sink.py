"""CockroachDB publish dialect (reference utils.py:151-155 folds
``cockroachdb`` into the PostgreSQL bulk-insert path; insert.py:19-21).

No CRDB server ships in this container, so coverage mirrors
test_pg_sink: a recording DB-API stub asserts the statement stream —
CRDB's native ``UPSERT INTO`` (equivalent to INSERT .. ON CONFLICT(pk)
DO UPDATE over every non-PK column, which is exactly the K1 shape), the
INT8/BYTES type map, %s paramstyle, chunking — and a semantic twin test
proves UPSERT-equals-ON-CONFLICT by replaying the same rows through the
PG grammar on DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest

from sc_crawler_spark.sinks.dialect import (
    COCKROACH, POSTGRES, SQLITE, create_table_sql, dialect_for, upsert_sql,
)
from sc_crawler_spark.sinks.postgres import publish_table_cockroach


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
    def __init__(self):
        self.log = []

    def cursor(self):
        return _RecordingCursor(self.log)

    def commit(self):
        self.log.append(("commit", None, None))


def _mk(spark, n=5):
    return spark.createDataFrame(
        [("aws", f"s{i}", float(i), i, i % 2 == 0) for i in range(n)],
        "vendor_id string, server_id string, price double, zone int, "
        "spot boolean")


def test_dialect_for_resolves_reference_aliases():
    assert dialect_for("cockroachdb") is COCKROACH
    assert dialect_for("crdb") is COCKROACH
    assert dialect_for("postgresql") is POSTGRES
    assert dialect_for("sqlite3") is SQLITE
    with pytest.raises(ValueError):
        dialect_for("oracle")


def test_cockroach_statement_stream(spark):
    con = _RecordingConn()
    n = publish_table_cockroach(con, _mk(spark, 150), "server_price",
                                pks=["vendor_id", "server_id"])
    assert n == 150
    kinds = [k for k, _, _ in con.log]
    assert kinds == ["execute", "executemany", "executemany", "commit"]
    ddl = con.log[0][1]
    assert '"zone" INT8' in ddl
    assert '"spot" BOOL' in ddl
    assert '"price" DOUBLE PRECISION' in ddl
    assert 'PRIMARY KEY ("vendor_id", "server_id")' in ddl
    dml, rows = con.log[1][1], con.log[1][2]
    assert dml.startswith('UPSERT INTO "server_price"')
    assert "ON CONFLICT" not in dml  # native upsert replaces the PG form
    assert dml.count("%s") == 5 and "?" not in dml
    assert len(rows) == 100 and len(con.log[2][2]) == 50


def test_cockroach_upsert_without_pk_falls_back_to_plain_insert():
    sql = upsert_sql(COCKROACH, "t", ["a", "b"], pks=[])
    assert sql.startswith('INSERT INTO "t"')
    assert "UPSERT" not in sql and "ON CONFLICT" not in sql


def test_cli_publish_routes_cockroach_dsn(spark, tmp_path, monkeypatch,
                                          capsys):
    """``publish --dialect cockroachdb`` sends the lake through the PG
    sink with the CRDB dialect (connect() monkeypatched — no server in
    this container)."""
    import json

    from sc_crawler_spark import cli
    from sc_crawler_spark.sinks import postgres as pg_sink
    from sc_crawler_spark.sinks.snapshot import write_snapshot

    lake = str(tmp_path / "lake")
    write_snapshot(spark, _mk(spark, 3), f"{lake}/server_price")
    con = _RecordingConn()
    monkeypatch.setattr(pg_sink, "connect", lambda dsn: con)
    cli.cmd_publish(spark, lake, "crdb://fake-dsn", version="1.2.3",
                    dialect="crdb")
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out["dialect"] == "cockroachdb"
    assert out["published"] == {"server_price": 3}
    upserts = [sql for k, sql, _ in con.log
               if k == "executemany" and sql.startswith("UPSERT INTO")]
    assert upserts, "CRDB native upsert used"
    # metadata KV still written last, via the PG-compatible ON CONFLICT
    last = max(i for i, e in enumerate(con.log)
               if e[0] in ("execute", "executemany"))
    assert "_metadata" in con.log[last][1]


def test_upsert_semantics_match_on_conflict_twin(spark):
    """UPSERT INTO == INSERT .. ON CONFLICT(pk) DO UPDATE all non-PKs:
    replay the recorded CRDB parameter stream through the PG statement
    on DuckDB and check the merged state is what CRDB would hold."""
    df = _mk(spark, 4)
    cols = [c for c, _ in df.dtypes]
    pks = ["vendor_id", "server_id"]
    con = duckdb.connect()
    con.execute(create_table_sql(POSTGRES, "server_price", df, pks))
    pg = upsert_sql(POSTGRES, "server_price", cols, pks).replace("%s", "?")
    rows = [tuple(r) for r in df.collect()]
    con.executemany(pg, rows)
    con.executemany(pg, [("aws", "s0", 99.0, 7, False)])  # conflict path
    got = {(v, s): (p, z, b) for v, s, p, z, b in
           con.execute("SELECT * FROM server_price").fetchall()}
    assert len(got) == 4
    assert got[("aws", "s0")] == (99.0, 7, False)
