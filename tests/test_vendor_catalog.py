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
            ("vc2-1c-1gb", 1, None, None, None, 1024, 25, None),
            ("vbm-8c-132gb", None, 16, 8, 3000, 131072, 960, None),
            ("vcg-grace-1c", 1, None, None, None, 2048, 30, "Grace"),
        ],
        "id string, vcpu_count int, cpu_threads int, cpu_count int, "
        "cpu_mhz int, ram long, disk int, cpu_family string",
    )
    out = {r["server_id"]: r for r in standardize_catalog(raw, "vultr").collect()}
    shared, metal = out["vc2-1c-1gb"], out["vbm-8c-132gb"]
    assert shared["cpu_allocation"] == "Shared" and shared["vcpus"] == 1
    assert metal["cpu_allocation"] == "Dedicated"
    assert metal["vcpus"] == 16        # falls back to cpu_threads
    assert metal["cpu_cores"] == 8
    assert metal["cpu_speed"] == 3.0   # MHz -> GHz
    assert metal["memory_amount"] == 131072
    assert shared["cpu_architecture"] == "x86_64"
    assert out["vcg-grace-1c"]["cpu_architecture"] == "arm64"


def test_vultr_gpu_plans(spark):
    """Vultr GPU resolution (reference _vultr.py:420-466): fractional
    'n/m' API counts, vram_total/per-gpu derivation, and the two
    Dedicated Metal ids whose payload omits the GPU block entirely."""
    raw = spark.createDataFrame(
        [
            # fractional vGPU: API count '1/12' of an A16
            ("vcg-a16-frac", 1, 2048, 30, "vcg",
             "NVIDIA_A16", 2.0, "1/12"),
            # whole-GPU plan with no API count: 160 GB total / 80 per = 2
            ("vcg-a100-2x", 12, 122880, 1400, "vcg",
             "NVIDIA_A100_PCIE", 160.0, None),
            # Dedicated Metal fallback dim: payload has NO gpu block
            ("vcg-a100-96c-896g-320vram", 96, 917504, 1920, "vdm",
             None, None, None),
            # plain plan: everything 0, never NULL
            ("vc2-1c-1gb", 1, 1024, 25, "vc2", None, None, None),
        ],
        "id string, vcpu_count int, ram long, disk int, type string, "
        "gpu_type string, gpu_vram_gb double, gpu_count string",
    )
    out = {r["server_id"]: r for r in
           standardize_catalog(raw, "vultr").collect()}
    frac = out["vcg-a16-frac"]
    assert frac["gpu_count"] == round(1 / 12, 4)
    assert frac["gpu_model"] == "A16"
    assert frac["gpu_manufacturer"] == "NVIDIA"
    assert frac["family"] == "Cloud GPU"
    # fractional slice: exposed VRAM is the slice total (2 GB), not the
    # card's 16 — least(per_gpu, total)
    assert frac["gpu_memory_min"] == 2 * 1024
    dual = out["vcg-a100-2x"]
    assert dual["gpu_count"] == 2.0
    assert dual["gpu_model"] == "A100"
    assert dual["gpu_memory_total"] == 160 * 1024
    assert dual["gpu_memory_min"] == 80 * 1024
    metal = out["vcg-a100-96c-896g-320vram"]
    assert metal["gpu_count"] == 4.0
    assert metal["gpu_model"] == "A100"
    assert metal["gpu_memory_total"] == 320 * 1024
    # SXM 80 GB/GPU: per-GPU x count must equal the 320 GB total
    assert metal["gpu_memory_min"] == 80 * 1024
    assert metal["family"] == "Dedicated Metal GPU"
    plain = out["vc2-1c-1gb"]
    assert plain["gpu_count"] == 0.0
    assert plain["gpu_memory_total"] == 0


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


# ---------------------------------------------------- GCP + Azure (P1)

def test_gcp_machine_type_standardization(spark):
    """Mock machineTypes payloads in the reference's test style
    (_gcp.py:289-350)."""
    rows = [
        (3001, "n2-standard-4", "4 vCPUs 16 GB RAM", 4, 16384, False,
         None, {"state": ""}),
        (3002, "e2-micro", "shared-core", 2, 1024, True, None, {"state": ""}),
        (3003, "t2a-standard-8", "Ampere Altra ARM", 8, 32768, False,
         None, {"state": ""}),
        (3004, "a2-highgpu-1g", "1x A100", 12, 87040, False,
         [{"guest_accelerator_count": 1,
           "guest_accelerator_type": "nvidia-tesla-a100"}], {"state": ""}),
        (3005, "n1-standard-1", "legacy", 1, 3840, False, None,
         {"state": "DEPRECATED"}),
    ]
    schema = ("id long, name string, description string, guest_cpus int, "
              "memory_mb long, is_shared_cpu boolean, "
              "accelerators array<struct<guest_accelerator_count:int,"
              "guest_accelerator_type:string>>, "
              "deprecated struct<state:string>")
    raw = spark.createDataFrame(rows, schema)
    out = {r["server_id"]: r for r in
           standardize_catalog(raw, "gcp").collect()}
    assert out["3001"]["family"] == "n2"
    assert out["3001"]["cpu_allocation"] == "Dedicated"
    assert out["3001"]["memory_amount"] == 16384
    assert out["3002"]["cpu_allocation"] == "Shared"
    assert out["3003"]["cpu_architecture"] == "arm64"
    assert out["3001"]["cpu_architecture"] == "x86_64"
    assert out["3004"]["gpu_count"] == 1
    assert out["3004"]["gpu_model"] == "nvidia-tesla-a100"
    assert out["3004"]["gpu_memory_total"] is None   # unknown, not 0
    assert out["3001"]["gpu_memory_total"] == 0      # no GPU -> 0
    assert out["3005"]["status"] == "inactive"
    assert out["3001"]["status"] == "active"


def _azure_sku(name, family, caps):
    return (name, family,
            [{"name": k, "value": str(v)} for k, v in caps.items()])


def test_azure_vm_standardization(spark):
    """Mock SKU payloads mirroring _azure.py:453-579's docstring example
    (Standard_L80as_v3) plus GPU-mapped sizes."""
    from sc_crawler_spark.sources.azure import standardize_azure_servers

    rows = [
        _azure_sku("Standard_L80as_v3", "standardLASv3Family", {
            "MaxResourceVolumeMB": 819200, "vCPUs": 80,
            "MemoryGB": 640, "CpuArchitectureType": "x64",
            "vCPUsAvailable": 80, "NvmeDiskSizeInMiB": 18310546,
        }),
        _azure_sku("Standard_NC24ads_A100_v4", "standardNCADSA100v4Family", {
            "vCPUs": 24, "MemoryGB": 220, "CpuArchitectureType": "x64",
            "vCPUsAvailable": 24,
        }),
        _azure_sku("Standard_NV12ads_A10_v5", "standardNVADSA10v5Family", {
            "vCPUs": 12, "MemoryGB": 110, "CpuArchitectureType": "x64",
            "vCPUsAvailable": 12,
        }),
        _azure_sku("Standard_B2s", "standardBSFamily", {
            "vCPUs": 2, "MemoryGB": 4, "CpuArchitectureType": "x64",
            "vCPUsAvailable": 2,
        }),
        _azure_sku("Standard_D2ps_v5", "standardDPSv5Family", {
            "vCPUs": 2, "MemoryGB": 8, "CpuArchitectureType": "Arm64",
            "vCPUsAvailable": 2,
        }),
        _azure_sku("Standard_ND40rs_v2", "standardNDSv2Family", {
            "vCPUs": 40, "MemoryGB": 672, "CpuArchitectureType": "x64",
            "vCPUsAvailable": 40,
        }),
    ]
    schema = ("name string, family string, "
              "capabilities array<struct<name:string,value:string>>")
    raw = spark.createDataFrame(rows, schema)
    out = {r["server_id"]: r for r in standardize_azure_servers(raw).collect()}

    l80 = out["Standard_L80as_v3"]
    assert l80["name"] == "L80as_v3"
    assert l80["family"] == "LASv3"
    assert l80["vcpus"] == 80
    assert l80["memory_amount"] == 640 * 1024
    # temp disk 819 GB + NVMe round(18310546 MiB -> GB) = 19200
    assert [s["storage_type"] for s in l80["storages"]] == ["ssd", "nvme ssd"]
    assert l80["storage_size"] == 819 + 19200
    assert "AMD processor" in l80["description"]
    assert "Intel" not in l80["description"]
    assert l80["description"].endswith("80 vCPUs")

    nc = out["Standard_NC24ads_A100_v4"]
    assert nc["gpu_count"] == 1.0       # A100 listed -> not the 4x K80 case
    assert nc["gpu_model"] is None      # A100 memory not in the name map
    nv = out["Standard_NV12ads_A10_v5"]
    assert nv["gpu_model"] == "A10"
    assert nv["gpu_count"] == round(1 / 3, 4)
    nd = out["Standard_ND40rs_v2"]
    assert nd["gpu_model"] == "V100"
    assert nd["gpu_count"] == 8.0
    assert nd["gpu_memory_min"] == int(32 * 1e9 / 1048576)
    assert nd["gpu_memory_total"] == 8 * int(32 * 1e9 / 1048576)

    assert out["Standard_B2s"]["cpu_allocation"] == "Burstable"
    assert out["Standard_D2ps_v5"]["cpu_architecture"] == "arm64"
    assert "ARM processor" in out["Standard_D2ps_v5"]["description"]


def test_ovh_storage_blob_schema_drift(spark):
    """The storage expr must adapt to exactly the nested fields THIS
    dump carries: full nvme disks sum capacity x number; a storage
    struct WITHOUT a disks array (or whose disk elements lack
    capacity) contributes 0 instead of failing analysis; a disks
    element without number counts each disk once."""
    base = "planCode string, invoiceName string, product string, "
    # dump A: nvme with capacity+number, storage struct with no disks
    raw_a = spark.createDataFrame(
        [("a.consumption", "A", "publiccloud-instance",
          {"commercial": {"name": "A", "brickSubtype": None},
           "technical": {"cpu": {"cores": 2, "frequency": 2.0},
                         "memory": {"size": 4},
                         "gpu": None,
                         "nvme": {"disks": [{"capacity": 400, "number": 2}]},
                         "storage": {"raid": "1"},
                         "os": {"family": "linux"}}})],
        base + "blobs struct<commercial: struct<name: string, "
        "brickSubtype: string>, technical: struct<"
        "cpu: struct<cores: int, frequency: double>, "
        "memory: struct<size: int>, "
        "gpu: struct<number: int, memory: struct<size: int>>, "
        "nvme: struct<disks: array<struct<capacity: int, number: int>>>, "
        "storage: struct<raid: string>, "
        "os: struct<family: string>>>")
    out = standardize_catalog(raw_a, "ovh").collect()[0]
    assert out["storage_size"] == 800  # 400 x 2; storage blob skipped
    # dump B: storage disks without a number field -> count once each
    raw_b = spark.createDataFrame(
        [("b.consumption", "B", "publiccloud-instance",
          {"commercial": {"name": "B", "brickSubtype": None},
           "technical": {"cpu": {"cores": 2, "frequency": 2.0},
                         "memory": {"size": 4},
                         "gpu": None,
                         "storage": {"disks": [{"capacity": 100},
                                               {"capacity": 50}]},
                         "os": {"family": "linux"}}})],
        base + "blobs struct<commercial: struct<name: string, "
        "brickSubtype: string>, technical: struct<"
        "cpu: struct<cores: int, frequency: double>, "
        "memory: struct<size: int>, "
        "gpu: struct<number: int, memory: struct<size: int>>, "
        "storage: struct<disks: array<struct<capacity: int>>>, "
        "os: struct<family: string>>>")
    out = standardize_catalog(raw_b, "ovh").collect()[0]
    assert out["storage_size"] == 150
