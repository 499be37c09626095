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


def test_mount_bucketed_survives_catalog_loss(spark, tmp_path):
    """The in-memory catalog dies with the session but the bucket
    files don't: dropping the table and re-mounting the SAME directory
    with external DDL must restore the bucket spec — the join still
    reads co-located buckets with no Exchange below it."""
    from sc_crawler_spark.sinks.bucketed import mount_bucketed

    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
    spark.sql("DROP TABLE IF EXISTS b_remount_a")
    spark.sql("DROP TABLE IF EXISTS b_remount_b")
    write_bucketed(df, "b_remount_a", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "a"))
    write_bucketed(df, "b_remount_b", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "b"))
    # simulate a fresh session: catalog entries gone, files remain
    spark.sql("DROP TABLE b_remount_a")
    spark.sql("DROP TABLE b_remount_b")
    a = mount_bucketed(spark, "b_remount_a", str(tmp_path / "a"),
                       ["k"], 4, sort_cols=["k"])
    b = mount_bucketed(spark, "b_remount_b", str(tmp_path / "b"),
                       ["k"], 4, sort_cols=["k"])
    assert a.count() == 10000
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b.select(F.col("k").alias("k2"), "v"),
                   F.col("k") == F.col("k2"))
        plan = _plan(j)
        assert "Bucketed: true" in plan
        join_part = plan[plan.index("Join"):] if "Join" in plan else plan
        assert "Exchange" not in join_part
        assert j.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("b_remount_a", "b_remount_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_write_one_file_per_bucket(spark, tmp_path):
    """The writer must repartition on the bucket key first: without it,
    each of the N input partitions writes its own sliver of every
    bucket — N x n_buckets tiny files whose open cost made the bucketed
    READ slower than the exchange it saves (r7 64x measurement:
    1024 files scanned 2.2x slower than 32). One file per bucket is
    the layout contract."""
    import glob

    df = spark.range(0, 50000).repartition(16).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v"))
    spark.sql("DROP TABLE IF EXISTS b_layout")
    write_bucketed(df, "b_layout", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "b_layout"))
    try:
        files = glob.glob(str(tmp_path / "b_layout" / "*.parquet"))
        assert len(files) == 8, (
            f"expected one file per bucket, got {len(files)}")
        assert bucketed(spark, "b_layout").count() == 50000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_layout")
