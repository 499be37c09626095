"""Sketch-accuracy gate for the approx-median scale twin (no SQL
oracle — Spark GK sketch vs DuckDB t-digest differ by construction, so
the bound is proven against the EXACT median instead)."""

from __future__ import annotations

from sc_crawler_spark.queries.tpch import approx_median_price, exact_median_price

SF = "/root/testdata/sf0.01"


def test_approx_median_within_half_percent_of_exact(spark):
    exact = {r["o_orderpriority"]: r["median_price"]
             for r in exact_median_price(spark, SF).collect()}
    approx = {r["o_orderpriority"]: r["median_price"]
              for r in approx_median_price(spark, SF).collect()}
    assert set(exact) == set(approx)
    for k, ev in exact.items():
        assert abs(approx[k] - ev) / ev < 0.005, (k, approx[k], ev)


def test_approx_median_counts_match_exact(spark):
    exact = {r["o_orderpriority"]: r["n_orders"]
             for r in exact_median_price(spark, SF).collect()}
    approx = {r["o_orderpriority"]: r["n_orders"]
              for r in approx_median_price(spark, SF).collect()}
    assert exact == approx
