"""Data-driven vendor standardization (S4/P1) on mock payloads mirroring
the reference's fixture style (tests/test_databases.py)."""

from __future__ import annotations

from sc_crawler_spark.sources.catalog import (
    enrich_hcloud_cpu, hcloud_cpu_dim, standardize_catalog,
)


def test_hcloud_standardize_and_cpu_lookup(spark):
    raw = spark.createDataFrame(
        [
            (1, "cpx11", 2, 2.0, 40, "shared", "x86"),
            (2, "cax11", 2, 4.0, 40, "shared", "arm"),
            (3, "weird", 8, 32.0, 240, "dedicated", "x86"),
        ],
        "id long, name string, cores int, memory double, disk int, "
        "cpu_type string, architecture string",
    )
    std = standardize_catalog(raw, "hcloud")
    out = {r["name"]: r for r in enrich_hcloud_cpu(std, hcloud_cpu_dim(spark)).collect()}
    assert out["cpx11"]["vendor_id"] == "hcloud"
    assert out["cpx11"]["memory_amount"] == 2048       # GB -> MiB
    assert out["cpx11"]["cpu_allocation"] == "Shared"
    assert out["cpx11"]["cpu_manufacturer"] == "AMD"   # manual dim (J1)
    assert out["cpx11"]["cpu_family"] == "EPYC"
    assert out["cax11"]["cpu_architecture"] == "arm64"
    assert out["cax11"]["cpu_manufacturer"] == "Ampere"
    assert out["weird"]["cpu_manufacturer"] is None    # unknown plan survives
    assert out["weird"]["cpu_allocation"] == "Dedicated"


def test_vultr_shared_vs_metal(spark):
    raw = spark.createDataFrame(
        [
            ("vc2-1c-1gb", 1, None, None, None, 1024, 25),
            ("vbm-8c-132gb", None, 16, 8, 3000, 131072, 960),
        ],
        "id string, vcpu_count int, cpu_threads int, cpu_count int, "
        "cpu_mhz int, ram long, disk int",
    )
    out = {r["server_id"]: r for r in standardize_catalog(raw, "vultr").collect()}
    shared, metal = out["vc2-1c-1gb"], out["vbm-8c-132gb"]
    assert shared["cpu_allocation"] == "Shared" and shared["vcpus"] == 1
    assert metal["cpu_allocation"] == "Dedicated"
    assert metal["vcpus"] == 16        # falls back to cpu_threads
    assert metal["cpu_cores"] == 8
    assert metal["cpu_speed"] == 3.0   # MHz -> GHz
    assert metal["memory_amount"] == 131072


def test_upcloud_plan_passthrough(spark):
    raw = spark.createDataFrame(
        [("HICPU-8xCPU-16GB", 8, 16384, 200)],
        "name string, core_number int, memory_amount long, storage_size int",
    )
    r = standardize_catalog(raw, "upcloud").collect()[0]
    assert r["server_id"] == "HICPU-8xCPU-16GB"
    assert r["vcpus"] == 8 and r["memory_amount"] == 16384
    assert r["status"] == "active"
