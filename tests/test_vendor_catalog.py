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


def test_ovh_catalog_filter_and_nested_projection(spark):
    """OVH addons: linux/consumption gate (_ovh.py:584-596), nested
    blob projection, Discovery=Shared (_ovh.py:613-618)."""
    raw = spark.createDataFrame(
        [
            ("b2-7.consumption", "B2-7", "publiccloud-instance",
             {"commercial": {"name": "B2-7", "brickSubtype": None},
              "technical": {"cpu": {"cores": 2, "frequency": 2.3},
                            "memory": {"size": 7},
                            "gpu": None,
                            "os": {"family": "linux"}}}),
            ("d2-4.consumption", "D2-4", "publiccloud-instance",
             {"commercial": {"name": "D2-4", "brickSubtype": "discovery"},
              "technical": {"cpu": {"cores": 2, "frequency": None},
                            "memory": {"size": 4},
                            "gpu": None,
                            "os": {"family": "linux"}}}),
            ("b2-7.monthly", "B2-7m", "publiccloud-instance",     # not hourly
             {"commercial": {"name": "B2-7", "brickSubtype": None},
              "technical": {"cpu": {"cores": 2, "frequency": 2.3},
                            "memory": {"size": 7},
                            "gpu": None,
                            "os": {"family": "linux"}}}),
            ("win-b2-7.consumption", "WIN-B2-7", "publiccloud-instance",  # windows
             {"commercial": {"name": "B2-7", "brickSubtype": None},
              "technical": {"cpu": {"cores": 2, "frequency": 2.3},
                            "memory": {"size": 7},
                            "gpu": None,
                            "os": {"family": "windows"}}}),
            ("t1-45.consumption", "T1-45", "publiccloud-instance",  # GPU plan
             {"commercial": {"name": "T1-45", "brickSubtype": None},
              "technical": {"cpu": {"cores": 8, "frequency": None},
                            "memory": {"size": 45},
                            "gpu": {"number": 1, "memory": {"size": 16}},
                            "os": {"family": "linux"}}}),
        ],
        "planCode string, invoiceName string, product string, "
        "blobs struct<commercial: struct<name: string, brickSubtype: string>, "
        "technical: struct<cpu: struct<cores: int, frequency: double>, "
        "memory: struct<size: int>, "
        "gpu: struct<number: int, memory: struct<size: int>>, "
        "os: struct<family: string>>>",
    )
    out = {r["server_id"]: r for r in standardize_catalog(raw, "ovh").collect()}
    assert set(out) == {"B2-7", "D2-4", "T1-45"}       # monthly+windows gated
    assert out["B2-7"]["cpu_allocation"] == "Dedicated"
    assert out["D2-4"]["cpu_allocation"] == "Shared"   # discovery series
    assert out["B2-7"]["memory_amount"] == 7 * 1024    # GiB -> MiB
    assert out["B2-7"]["cpu_speed"] == 2.3
    assert out["T1-45"]["gpu_count"] == 1
    assert out["T1-45"]["gpu_memory_min"] == 16 * 1024


def test_alicloud_instance_types(spark):
    """Alicloud DescribeInstanceTypes (_alicloud.py:920-1010): GiB->MiB
    memory, GiB->GB local storage, per-GPU vs total VRAM, burstable."""
    raw = spark.createDataFrame(
        [
            ("ecs.g6.large", "g6", 2, 8.0, 2.5, "X86", "General-purpose", 0,
             0, 0.0, None, 0.0),
            ("ecs.t5-lc1m1.small", "t5", 1, 1.0, None, "X86", "Shared", 10,
             0, 0.0, None, 0.0),
            ("ecs.gn6i-c4g1.xlarge", "gn6i", 4, 15.0, 2.5, "X86",
             "GPU-accelerated", 0, 1, 15.0, None, 0.0),
            ("ecs.gn7-c12g1.24xlarge", "gn7", 96, 376.0, None, "ARM",
             "GPU-accelerated", 0, 8, 40.0, "local_ssd_pro", 1788.0),
        ],
        "InstanceTypeId string, InstanceTypeFamily string, CpuCoreCount int, "
        "MemorySize double, CpuSpeedFrequency double, CpuArchitecture string, "
        "InstanceCategory string, BaselineCredit int, GPUAmount int, "
        "GPUMemorySize double, LocalStorageCategory string, "
        "LocalStorageCapacity double",
    )
    raw = raw.selectExpr("*", "CAST(1 AS INT) AS LocalStorageAmount")
    out = {r["server_id"]: r
           for r in standardize_catalog(raw, "alicloud").collect()}
    g6 = out["ecs.g6.large"]
    assert g6["memory_amount"] == 8 * 1024
    assert g6["cpu_architecture"] == "x86_64"
    assert g6["cpu_allocation"] == "Dedicated"
    assert g6["cpu_speed"] == 2.5
    assert out["ecs.t5-lc1m1.small"]["cpu_allocation"] == "Burstable"
    gpu1 = out["ecs.gn6i-c4g1.xlarge"]
    assert gpu1["gpu_memory_total"] == 15 * 1024       # single GPU: total
    gpu8 = out["ecs.gn7-c12g1.24xlarge"]
    assert gpu8["gpu_memory_total"] == 8 * 40 * 1024   # multi: per-GPU x n
    assert gpu8["cpu_architecture"] == "arm64"
    assert gpu8["storage_size"] == int(1 * 1788 * 1024**3 / 1000**3)
