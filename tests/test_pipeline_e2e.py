"""End-to-end bronze->silver->query slice (SURVEY.md §7.2 step 2):
raw vendor payloads -> standardize (P1-P3) -> validate/default-fill (P8)
-> keep-last dedup (A4) -> merge upsert with inactivate-missing (K1+T1)
-> 'cheapest price per server across regions' query, checked against a
DuckDB oracle over the same staged rows."""

from __future__ import annotations

import json

import duckdb
from pyspark.sql import functions as F

from sc_crawler_spark.operators.upsert import merge_upsert
from sc_crawler_spark.operators.validate import validate_items
from sc_crawler_spark.operators.windows import keep_last_dedup
from sc_crawler_spark.sources import aws


def _raw_instance(name: str, vcpus: int, mib: int) -> str:
    return json.dumps({
        "InstanceType": name,
        "BurstablePerformanceSupported": name.startswith("t"),
        "VCpuInfo": {"DefaultVCpus": vcpus, "DefaultCores": vcpus // 2},
        "ProcessorInfo": {"SupportedArchitectures": ["x86_64"],
                          "SustainedClockSpeedInGhz": 3.1,
                          "Manufacturer": "Intel"},
        "MemoryInfo": {"SizeInMiB": mib},
        "NetworkInfo": {"NetworkCards": [
            {"BaselineBandwidthInGbps": 5.0, "PeakBandwidthInGbps": 10.0}]},
        "Hypervisor": "nitro",
    })


def test_bronze_to_silver_to_query(spark):
    # ---- bronze: raw payloads (two fetches; t3.small re-observed)
    raw = spark.createDataFrame(
        [(_raw_instance("t3.small", 2, 2048), 0),
         (_raw_instance("m5.large", 2, 8192), 1),
         (_raw_instance("t3.small", 2, 2048), 2)],  # duplicate, later pos
        ["json", "_pos"],
    ).select(F.from_json("json", aws.RAW_INSTANCE_TYPE).alias("payload"), "_pos")

    # ---- standardize (P1) + keep-last dedup (A4)
    servers = aws.standardize_instance_types(raw.select("payload"))
    stamped = servers.join(
        raw.select(F.col("payload")["InstanceType"].alias("server_id"), "_pos"),
        "server_id",
    )
    deduped = keep_last_dedup(stamped, ["vendor_id", "server_id"], "_pos").drop("_pos")
    assert deduped.count() == 2

    # ---- validate/default-fill (P8)
    valid, invalid = validate_items(deduped, "server")
    assert invalid.count() == 0
    assert valid.count() == 2
    row = valid.filter(F.col("server_id") == "t3.small").collect()[0]
    assert row.status == "active" and row.observed_at is not None
    assert row.cpu_allocation == "Burstable"
    assert row.gpu_count == 0.0          # default-filled non-null
    assert row.storage_size == 0

    # broken row -> quarantined, not job-failing
    broken = deduped.withColumn(
        "vcpus", F.when(F.col("server_id") == "m5.large", None)
        .otherwise(F.col("vcpus"))
    )
    v2, inv2 = validate_items(broken, "server")
    assert v2.count() == 1 and inv2.count() == 1
    assert inv2.collect()[0]._errors == ["vcpus"]

    # ---- prices (P2/P3) + upsert cycle (K1+T1) + flagship slice query
    prices = spark.createDataFrame(
        [("aws", "us-east-1", "use1-az1", "t3.small", "ondemand", 0.0208),
         ("aws", "us-east-1", "use1-az2", "t3.small", "ondemand", 0.0210),
         ("aws", "us-west-2", "usw2-az1", "t3.small", "ondemand", 0.0104),
         ("aws", "us-east-1", "use1-az1", "m5.large", "ondemand", 0.0960)],
        ["vendor_id", "region_id", "zone_id", "server_id", "allocation",
         "price"],
    ).withColumn("status", F.lit("active"))
    refreshed = prices.filter(F.col("zone_id") != "use1-az2").withColumn(
        "price", F.col("price") * 2
    )
    merged = merge_upsert(
        prices, refreshed,
        pks=["vendor_id", "region_id", "zone_id", "server_id", "allocation"],
        inactivate_missing=True,
    )
    inactive = merged.filter(F.col("status") == "inactive").collect()
    assert len(inactive) == 1 and inactive[0].zone_id == "use1-az2"

    cheapest = (
        merged.filter(F.col("status") == "active")
        .groupBy("server_id")
        .agg(F.round(F.min("price"), 4).alias("min_price"))
    )
    got = {r.server_id: r.min_price for r in cheapest.collect()}

    # ---- DuckDB oracle over the identical staged rows
    con = duckdb.connect()
    pdf = merged.toPandas()
    con.register("server_price", pdf)
    want = dict(con.execute(
        "SELECT server_id, round(MIN(price), 4) FROM server_price "
        "WHERE status = 'active' GROUP BY server_id"
    ).fetchall())
    assert got == want
    assert got["t3.small"] == 0.0208  # usw2 (0.0104) doubled to 0.0208
