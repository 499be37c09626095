"""Bucketed co-located joins: the write-time partitioning must delete
the join-time shuffle (sinks/bucketed.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sc_crawler_spark.sinks.bucketed import bucketed, write_bucketed


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.range(0, 20000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 1000).alias("o_custkey"))
    lineitem = spark.range(0, 60000).select(
        (F.col("id") % 20000).alias("l_orderkey"),
        (F.col("id") % 7 + 1.0).alias("l_quantity"))

    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"],
                   path=str(tmp_path / "b_orders"))
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"],
                   path=str(tmp_path / "b_lineitem"))

    # disable auto-broadcast so a non-bucketed plan WOULD shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed(spark, "b_orders").join(
            bucketed(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).groupBy("o_custkey").agg(F.sum("l_quantity").alias("qty"))
        plan = _plan(joined)
        # the join itself must read the buckets directly: no Exchange
        # below the join (the groupBy above it may still shuffle)
        join_part = plan[plan.index("Join"):] if "Join" in plan else plan
        assert "Exchange" not in join_part, join_part[:2000]

        # and the result is right
        total = joined.agg(F.sum("qty")).collect()[0][0]
        plain = (orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .agg(F.sum("l_quantity")).collect()[0][0])
        assert total == plain

        # the un-bucketed twin of the same join DOES shuffle — the
        # comparison that proves bucketing (not size) removed it
        unb = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        unb_plan = _plan(unb)
        assert "Exchange" in unb_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
