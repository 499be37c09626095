"""Bucketed co-located joins (scale path for repeated big-big joins) and
sig-fig rounding parity against the reference's Python semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Writing both join sides bucketed by the join key makes the join
    exchange-free: at 100 TB this turns every repeated
    lineitem-orders-style join into a local zip of co-located buckets."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("li_b"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("ord_b"))

    # disable auto-broadcast so the join would otherwise shuffle
    spark.sql("SET spark.sql.autoBroadcastJoinThreshold=-1")
    try:
        j = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself reads co-located buckets: no Exchange below it
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, plan
        got = {r["o_orderpriority"]: r["count"] for r in j.collect()}
        want = {
            r["o_orderpriority"]: r["count"]
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority").count().collect()
        }
        assert got == want
    finally:
        spark.sql("SET spark.sql.autoBroadcastJoinThreshold=67108864")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def _py_round_measurement(v, sig=4, integer_at=1000.0):
    if abs(v) >= integer_at:
        return float(round(v))
    return float(f"{v:.{sig}g}")


def _py_round_sigfigs(v, sig=3):
    return float(f"{v:.{sig}g}")


def test_sigfig_parity_with_python_reference(spark):
    """round_sig_figs == _round_measurement and round_sig_figs_pure ==
    _round_sigfigs (workload_profile_scores.py:37-57) over a wide seeded
    sample, evaluated in one Spark batch."""
    import random

    from sc_crawler_spark.functions.scalars import (
        round_sig_figs, round_sig_figs_pure,
    )

    # NOTE: values exactly halfway at the rounding boundary (e.g.
    # -1234.5 at integer precision) are excluded: CPython's round()/%g
    # are HALF-EVEN there, while the engine rounds HALF-UP to stay
    # bit-identical with the DuckDB oracle (both engines round halves
    # away from zero) — the cross-ENGINE parity is the contract the
    # correctness gate checks. Documented deviation, not a bug.
    rng = random.Random(42)
    vals = [
        rng.uniform(-1e6, 1e6) * (10 ** rng.randint(-6, 3))
        for _ in range(500)
    ] + [0.0004, 251435.6, 1000.0, 0.1, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        "v",
        round_sig_figs(F.col("v"), 4).alias("meas"),
        round_sig_figs_pure(F.col("v"), 3).alias("pure"),
    ).collect()
    for r in rows:
        want_meas = _py_round_measurement(r["v"])
        want_pure = _py_round_sigfigs(r["v"])
        assert r["meas"] == want_meas or math.isclose(
            r["meas"], want_meas, rel_tol=1e-12
        ), (r["v"], r["meas"], want_meas)
        assert r["pure"] == want_pure or math.isclose(
            r["pure"], want_pure, rel_tol=1e-12
        ), (r["v"], r["pure"], want_pure)
