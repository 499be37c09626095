"""Sketch-accuracy gate for the approx scale twins. Since r10 the
queries carry their own tolerance verdict (``within_bound`` — sketch
vs in-query exact arm; see the r9-verdict task-5 docstrings), so the
gate here asserts (a) every group's sketch stayed inside tolerance and
(b) the exact arms agree with the standalone exact queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from sc_crawler_spark.queries.lifecycle import approx_distinct_users
from sc_crawler_spark.queries.tpch import approx_median_price, exact_median_price
from sc_crawler_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_approx_median_within_half_percent_of_exact(spark):
    rows = approx_median_price(spark, SF).collect()
    assert rows
    bad = [r["o_orderpriority"] for r in rows if not r["within_bound"]]
    assert not bad, f"GK sketch out of 0.5% tolerance for {bad}"


def test_approx_median_exact_arm_matches_exact_query(spark):
    exact = {r["o_orderpriority"]: (r["median_price"], r["n_orders"])
             for r in exact_median_price(spark, SF).collect()}
    twin = {r["o_orderpriority"]: (r["median_price_exact"], r["n_orders"])
            for r in approx_median_price(spark, SF).collect()}
    assert exact == twin


def test_approx_distinct_within_two_percent_of_exact(spark):
    """HLL++ twin: rsd=0.005 -> expected error well under 1%; the 2%
    gate is loose enough to be seed-stable."""
    rows = approx_distinct_users(spark, SF).collect()
    assert rows
    bad = [r["event_type"] for r in rows if not r["within_bound"]]
    assert not bad, f"HLL sketch out of 2% tolerance for {bad}"


def test_approx_distinct_exact_arm_matches_groupby(spark):
    exact = {r["event_type"]: (r["nu"], r["ne"])
             for r in load(spark, SF, "events").groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("nu"),
                  F.count("*").alias("ne")).collect()}
    twin = {r["event_type"]: (r["n_users_exact"], r["n_events"])
            for r in approx_distinct_users(spark, SF).collect()}
    assert exact == twin
