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


def test_approx_distinct_within_two_percent_of_exact(spark):
    """HLL++ twin: per-event-type distinct users within 2% of exact
    (rsd=0.005 -> expected error well under 1%; the gate is loose
    enough to be seed-stable)."""
    from pyspark.sql import functions as F

    from sc_crawler_spark.queries.lifecycle import approx_distinct_users
    from sc_crawler_spark.tables import load

    exact = {r["event_type"]: r["n"]
             for r in load(spark, SF, "events").groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r["event_type"]: r["n_users"]
              for r in approx_distinct_users(spark, SF).collect()}
    assert set(exact) == set(approx)
    for k, ev in exact.items():
        assert abs(approx[k] - ev) / ev < 0.02, (k, approx[k], ev)


def test_approx_distinct_event_counts_exact(spark):
    from pyspark.sql import functions as F

    from sc_crawler_spark.queries.lifecycle import approx_distinct_users
    from sc_crawler_spark.tables import load

    exact = {r["event_type"]: r["n"]
             for r in load(spark, SF, "events").groupBy("event_type")
             .agg(F.count("*").alias("n")).collect()}
    approx = {r["event_type"]: r["n_events"]
              for r in approx_distinct_users(spark, SF).collect()}
    assert exact == approx
