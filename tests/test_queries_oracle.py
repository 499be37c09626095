"""Every declared query vs its DuckDB oracle — the same comparison the
driver's t2 correctness gate performs (row count + schema + values)."""

from __future__ import annotations

import pytest

from sc_crawler_spark.queries import REGISTRY

from .conftest import SF_ORACLE, assert_oracle_match

CASES = [(name, fn, sql) for name, (fn, sql) in sorted(REGISTRY.items()) if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_query_matches_oracle(spark, name, fn, sql):
    assert_oracle_match(spark, name, fn, sql, SF_ORACLE)


def test_registry_complete():
    from __spark_entry__ import oracle_sql, queries

    q = queries()
    o = oracle_sql()
    assert len(q) >= 30
    assert set(o) <= set(q)


def test_entry_smoke(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns
