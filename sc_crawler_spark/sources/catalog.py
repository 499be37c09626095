"""Data-driven standardization for the long-tail vendors (SURVEY.md §2.1
S4, §2.3 P1; reference vendors/_hcloud.py, _vultr.py, _upcloud.py,
_ovh.py).

The reference writes one imperative fetch+transform per vendor; the
engine expresses each vendor as DATA — a column-mapping spec of target
column -> SQL expression over the raw payload — compiled into a single
``selectExpr`` projection. Adding a vendor is adding a dict, not code:
the plan, pushdown, and codegen come from the shared compiler.

Vendor-specific lookup tables (e.g. Hetzner's manual CPU list,
_hcloud.py:41-70) are literal dimension frames broadcast-joined on the
standardized rows (J1), not Python branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# target column -> SQL expression over the raw payload columns
VENDOR_SERVER_SPECS: dict[str, dict[str, str]] = {
    # _hcloud.py inventory_servers: cores/memory(GB)/disk(GB), cpu_type
    # shared|dedicated, architecture x86|arm
    "hcloud": {
        "server_id": "CAST(id AS STRING)",
        "name": "name",
        "api_reference": "name",
        "vcpus": "CAST(cores AS INT)",
        "cpu_allocation": (
            "CASE cpu_type WHEN 'shared' THEN 'Shared'"
            " WHEN 'dedicated' THEN 'Dedicated' END"
        ),
        "cpu_architecture": (
            "CASE architecture WHEN 'x86' THEN 'x86_64'"
            " WHEN 'arm' THEN 'arm64' END"
        ),
        "memory_amount": "CAST(memory * 1024 AS BIGINT)",  # GB -> MiB
        "storage_size": "CAST(disk AS BIGINT)",
    },
    # _vultr.py:392-470: vcpu_count (shared) vs cpu_count (metal),
    # cpu_mhz, ram in MiB, disk in GB
    "vultr": {
        "server_id": "id",
        "name": "id",
        "api_reference": "id",
        "vcpus": "CAST(coalesce(vcpu_count, cpu_threads) AS INT)",
        "cpu_cores": "CAST(cpu_count AS INT)",
        "cpu_allocation": (
            "CASE WHEN vcpu_count IS NOT NULL THEN 'Shared'"
            " ELSE 'Dedicated' END"
        ),
        "cpu_speed": "CAST(cpu_mhz AS DOUBLE) / 1000",
        # Grace (ARM) is the only non-x86 family (_vultr.py:411-413)
        "cpu_architecture": (
            "CASE WHEN coalesce(cpu_family, '') = 'Grace'"
            " THEN 'arm64' ELSE 'x86_64' END"
        ),
        "memory_amount": "CAST(ram AS BIGINT)",
        "storage_size": "CAST(disk AS BIGINT)",
    },
    # _upcloud.py:94-124: plan fields are already MiB/GB scalars; the
    # HICPU-8xCPU-16GB name grammar is parsed separately (P10,
    # sources/azure.parse_upcloud_plan)
    "upcloud": {
        "server_id": "name",
        "name": "name",
        "api_reference": "name",
        "vcpus": "CAST(core_number AS INT)",
        "cpu_architecture": "'x86_64'",  # _upcloud.py:415
        "memory_amount": "CAST(memory_amount AS BIGINT)",
        "storage_size": "CAST(storage_size AS BIGINT)",
    },
    # _ovh.py:580-735: public-cloud "flavor" addons; payload is the
    # nested catalog blob (commercial / technical structs). Resources
    # are dedicated except the Discovery series (:613-618); memory is
    # GiB -> MiB (:620-622).
    "ovh": {
        "server_id": "invoiceName",
        "name": "coalesce(blobs.commercial.name, invoiceName)",
        "api_reference": "planCode",
        "vcpus": "CAST(coalesce(blobs.technical.cpu.cores, 0) AS INT)",
        "cpu_allocation": (
            "CASE WHEN blobs.commercial.brickSubtype = 'discovery'"
            " THEN 'Shared' ELSE 'Dedicated' END"
        ),
        "cpu_speed": "CAST(blobs.technical.cpu.frequency AS DOUBLE)",
        "cpu_architecture": "'x86_64'",  # _ovh.py:714
        "memory_amount": (
            "CAST(blobs.technical.memory.size * 1024 AS BIGINT)"
        ),
        "gpu_count": "CAST(coalesce(blobs.technical.gpu.number, 0) AS INT)",
        "gpu_memory_min": (
            "CAST(coalesce(blobs.technical.gpu.memory.size, 0) * 1024 AS BIGINT)"
        ),
    },
    # _alicloud.py:829-1010 DescribeInstanceTypes: MemorySize is GiB
    # (x1024 -> MiB, :920), local storage GiB->GB (:926-932), GPU
    # memory is per-GPU when GPUAmount>1 else total (:938-941), CPU
    # allocation from BaselineCredit/InstanceCategory (:433-448).
    "alicloud": {
        "server_id": "InstanceTypeId",
        "name": "InstanceTypeId",
        "api_reference": "InstanceTypeId",
        "family": "InstanceTypeFamily",
        "vcpus": "CAST(CpuCoreCount AS INT)",
        "cpu_cores": "CAST(CpuCoreCount AS INT)",
        "cpu_speed": "nullif(CAST(CpuSpeedFrequency AS DOUBLE), 0.0)",
        "cpu_allocation": (
            "CASE WHEN coalesce(BaselineCredit, 0) > 0 THEN 'Burstable'"
            " WHEN InstanceCategory = 'Shared' THEN 'Shared'"
            " ELSE 'Dedicated' END"
        ),
        "cpu_architecture": (
            "CASE CpuArchitecture WHEN 'X86' THEN 'x86_64'"
            " WHEN 'ARM' THEN 'arm64' END"
        ),
        "memory_amount": "CAST(MemorySize * 1024 AS BIGINT)",
        "storage_size": (
            "CAST(coalesce(LocalStorageAmount, 0)"
            " * coalesce(LocalStorageCapacity, 0)"
            " * pow(1024, 3) / pow(1000, 3) AS BIGINT)"
        ),
        "gpu_count": "CAST(coalesce(GPUAmount, 0) AS INT)",
        "gpu_memory_total": (
            "CAST(CASE WHEN coalesce(GPUAmount, 0) >= 1"
            " THEN GPUAmount * coalesce(GPUMemorySize, 0) * 1024"
            " ELSE coalesce(GPUMemorySize, 0) * 1024 END AS BIGINT)"
        ),
    },
    # _gcp.py:289-350 machineTypes list: guest_cpus/memory_mb scalars,
    # shared-core flag, optional accelerators block, deprecation state.
    # t2a* is the ARM (Tau T2A) line (:311-315); family is the name's
    # first dash segment (:298); GPU memory is unknown (NULL) when an
    # accelerator is attached, 0 otherwise (:323-327).
    "gcp": {
        "server_id": "CAST(id AS STRING)",
        "name": "name",
        "api_reference": "name",
        "display_name": "name",
        "description": "description",
        "family": "split(name, '-')[0]",
        "vcpus": "CAST(guest_cpus AS INT)",
        "cpu_allocation": (
            "CASE WHEN is_shared_cpu THEN 'Shared' ELSE 'Dedicated' END"
        ),
        "cpu_architecture": (
            "CASE WHEN name LIKE 't2a%' THEN 'arm64' ELSE 'x86_64' END"
        ),
        "memory_amount": "CAST(memory_mb AS BIGINT)",
        "gpu_count": (
            "CAST(CASE WHEN size(accelerators) > 0"
            " THEN accelerators[0].guest_accelerator_count"
            " ELSE 0 END AS INT)"
        ),
        "gpu_model": (
            "CASE WHEN size(accelerators) > 0"
            " THEN accelerators[0].guest_accelerator_type END"
        ),
        "gpu_memory_min": (
            "CAST(CASE WHEN size(accelerators) > 0 THEN NULL"
            " ELSE 0 END AS BIGINT)"
        ),
        "gpu_memory_total": (
            "CAST(CASE WHEN size(accelerators) > 0 THEN NULL"
            " ELSE 0 END AS BIGINT)"
        ),
        "storage_size": "CAST(0 AS BIGINT)",
        "status": (
            "CASE WHEN coalesce(deprecated.state, '') = ''"
            " THEN 'active' ELSE 'inactive' END"
        ),
    },
}

# Catalog-level row gates applied before projection (P5 residual
# filters expressed as data, like the specs themselves).
VENDOR_SERVER_FILTERS: dict[str, str] = {
    # _ovh.py:584-596: linux public-cloud instances on hourly rates
    "ovh": (
        "product = 'publiccloud-instance'"
        " AND blobs.technical.os.family = 'linux'"
        " AND planCode LIKE '%.consumption'"
    ),
}


def standardize_catalog(raw: DataFrame, vendor_id: str,
                        spec: dict[str, str] | None = None) -> DataFrame:
    """Compile a vendor spec into one projection (P1). Unknown vendors
    must pass an explicit spec. A vendor's residual filter (P5) is
    applied before the projection so Catalyst can push it to the scan."""
    spec = spec or VENDOR_SERVER_SPECS[vendor_id]
    gate = VENDOR_SERVER_FILTERS.get(vendor_id)
    if gate is not None:
        raw = raw.filter(gate)
    out = raw.selectExpr(
        f"'{vendor_id}' AS vendor_id",
        *[f"{expr} AS {col}" for col, expr in spec.items()],
    )
    if "status" not in spec:  # vendors with a deprecation flag set their own
        out = out.withColumn("status", F.lit("active"))
    return out


# Hetzner's manual CPU mapping (_hcloud.py:41-70) as a literal dim.
_HCLOUD_CPU_ROWS = [
    (name, mfr, fam)
    for names, mfr, fam in [
        (["CX11", "CX21", "CX31", "CX41", "CX51", "CX22", "CX32", "CX42",
          "CX52"], "Intel", "Xeon Gold"),
        (["CX23", "CX33", "CX43", "CX53"], None, None),
        (["CPX11", "CPX21", "CPX31", "CPX41", "CPX51"], "AMD", "EPYC"),
        (["CPX12", "CPX22", "CPX32", "CPX42", "CPX52", "CPX62"], "AMD", None),
        (["CAX11", "CAX21", "CAX31", "CAX41"], "Ampere", "Ampere Altra"),
        (["CCX13", "CCX23", "CCX33", "CCX43", "CCX53", "CCX63"], "AMD", None),
    ]
    for name in names
]


def hcloud_cpu_dim(spark: SparkSession) -> DataFrame:
    values = ", ".join(
        "('{}', {}, {})".format(
            n,
            f"'{m}'" if m else "CAST(NULL AS STRING)",
            f"'{f}'" if f else "CAST(NULL AS STRING)",
        )
        for n, m, f in _HCLOUD_CPU_ROWS
    )
    return spark.sql(
        f"SELECT * FROM VALUES {values}"
        " AS t(name_upper, cpu_manufacturer, cpu_family)"
    )


def enrich_hcloud_cpu(servers: DataFrame, cpu_dim: DataFrame) -> DataFrame:
    """J1 — broadcast lookup of the manual CPU facts by plan name."""
    return servers.withColumn("name_upper", F.upper("name")).join(
        F.broadcast(cpu_dim), "name_upper", "left"
    ).drop("name_upper")


# ----------------------------------------------- static service catalogs
#
# Long-tail vendors publish storage/traffic/IPv4 pricing as documented
# constants, not APIs (reference _hcloud.py:294-386: "collected
# manually"). Each vendor is DATA: catalog rows plus per-region price
# templates fanned out over the vendor's landed regions — the engine
# side is one broadcast crossJoin per table, shared by every vendor.
STATIC_SERVICE_CATALOGS: dict[str, dict] = {
    # _hcloud.py:294-386 (docs.hetzner.com pricing pages)
    "hcloud": {
        "storage": [{
            "storage_id": "block", "name": "Block storage volume",
            "description": None, "storage_type": "network",
            "max_iops": None, "max_throughput": None,
            "min_size": 10, "max_size": 10000,
        }],
        "storage_price": [{
            "storage_id": "block", "unit": "GB",
            "price": 0.0440, "currency": "EUR",
        }],
        "traffic_price": [
            {"direction": "inbound", "price": 0.0, "unit": "GB",
             "currency": "EUR"},
            {"direction": "outbound", "price": 1 / 1024, "unit": "GB",
             "currency": "EUR"},
        ],
        "ipv4_price": [{
            "price": 0.50, "unit": "month", "currency": "EUR",
        }],
    },
    # _gcp.py:1058-1080: attached-IPv4 price is not in the billing API;
    # recorded from cloud.google.com/vpc/network-pricing#ipaddress
    "gcp": {
        "ipv4_price": [{
            "price": 0.005, "unit": "hour", "currency": "USD",
        }],
    },
    # _vultr.py:204-225, 630-725 (docs.vultr.com published rates); the
    # block-storage price rows carry the region-availability gate: they
    # fan out only to regions whose landed `options` list the product.
    "vultr": {
        "storage": [
            {"storage_id": "block_storage_high_perf",
             "name": "NVMe Block Storage",
             "description": "VBS high_perf (CSI vultr-block-storage).",
             "storage_type": "nvme ssd", "max_iops": 10_000,
             "max_throughput": 400, "min_size": 10, "max_size": 10_000},
            {"storage_id": "block_storage_storage_opt",
             "name": "HDD Block Storage",
             "description": "VBS storage_opt (CSI vultr-block-storage-hdd).",
             "storage_type": "hdd", "max_iops": 500,
             "max_throughput": 100, "min_size": 40, "max_size": 40_000},
        ],
        "storage_price": [
            {"storage_id": "block_storage_high_perf", "unit": "GB",
             "price": 0.10, "currency": "USD",
             "requires_option": "block_storage_high_perf"},
            {"storage_id": "block_storage_storage_opt", "unit": "GB",
             "price": 0.025, "currency": "USD",
             "requires_option": "block_storage_storage_opt"},
        ],
        "traffic_price": [
            {"direction": "inbound", "price": 0.0, "unit": "GB",
             "currency": "USD"},
            {"direction": "outbound", "price": 0.01, "unit": "GB",
             "currency": "USD"},
        ],
        "ipv4_price": [{
            "price": 3.0, "unit": "month", "currency": "USD",
        }],
    },
    # _upcloud.py:60-88: the storage catalog is a published constant
    # (prices come from the zone price API, not landed statically)
    "upcloud": {
        "storage": [
            {"storage_id": "hdd", "name": "Archive",
             "description": "High-capacity data storage",
             "storage_type": "hdd", "max_iops": 600,
             "max_throughput": None, "min_size": 1, "max_size": 4096},
            {"storage_id": "standard", "name": "Standard",
             "description": "General purpose data storage",
             "storage_type": "ssd", "max_iops": 10_000,
             "max_throughput": None, "min_size": 1, "max_size": 4096},
            {"storage_id": "maxiops", "name": "MaxIOPS",
             "description": "High-performance web servers and applications",
             "storage_type": "ssd", "max_iops": 100_000,
             "max_throughput": None, "min_size": 1, "max_size": 4096},
        ],
    },
}

_STATIC_ROW_SCHEMAS = {
    "storage": ("storage_id string, name string, description string, "
                "storage_type string, max_iops long, max_throughput long, "
                "min_size long, max_size long"),
    "storage_price": "storage_id string, unit string, price double, currency string",
    "traffic_price": "direction string, price double, unit string, currency string",
    "ipv4_price": "price double, unit string, currency string",
}

# catalog tables are region-independent; price tables fan out per region
_REGION_FANOUT = {"storage_price", "traffic_price", "ipv4_price"}


def static_service_tables(spark: SparkSession, vendor_id: str,
                          regions: DataFrame | None) -> dict[str, DataFrame]:
    """Build the vendor's static service tables; per-region price rows
    are the documented template crossJoined with the (broadcast) landed
    region list — mirrors the reference's `for region in vendor.regions`
    fan-out without driver loops."""
    spec = STATIC_SERVICE_CATALOGS.get(vendor_id, {})
    out: dict[str, DataFrame] = {}
    for table, rows in spec.items():
        schema = _STATIC_ROW_SCHEMAS[table] + ", requires_option string"
        tmpl = spark.createDataFrame(
            [tuple(r.get(f.split(" ")[0]) for f in schema.split(", "))
             for r in rows],
            schema,
        ).withColumn("vendor_id", F.lit(vendor_id))
        if table in _REGION_FANOUT:
            if regions is None:
                continue  # no landed regions -> nothing to price
            reg_cols = ["region_id"] + (
                ["options"] if "options" in regions.columns else [])
            tmpl = F.broadcast(tmpl).crossJoin(
                regions.select(*reg_cols).distinct())
            # region-availability gate (vultr _get_regions "options"):
            # a row with requires_option lands only where offered
            if "options" in regions.columns:
                tmpl = tmpl.filter(
                    F.col("requires_option").isNull()
                    | F.array_contains(
                        F.coalesce(F.col("options"),
                                   F.array().cast("array<string>")),
                        F.col("requires_option"))
                ).drop("options")
            else:
                tmpl = tmpl.filter(F.col("requires_option").isNull())
        out[table] = tmpl.drop("requires_option")
    return out


_PRICE_TIER_TYPE = "array<struct<lower:double,upper:string,price:double>>"


def catalog_server_prices(raw: DataFrame, regions: DataFrame,
                          vendor_id: str) -> DataFrame:
    """hcloud-style embedded per-location price lists -> ``server_price``
    rows (reference _hcloud.py:255-288).

    Expects the raw servers payload to carry
    ``prices: array<struct<location, hourly, monthly>>``. Hetzner bills
    hourly with a monthly cap, which the reference proxies as TIERED
    hourly pricing: [0, cap] at the hourly rate, (cap, Infinity) free,
    where cap = floor(monthly/hourly) discounted hours. Regions resolve
    through the landed name/alias probe; zone_id mirrors region_id
    (no zones at these vendors).
    """
    probe = regions.select(
        "region_id",
        F.explode(F.array_union(
            F.array(F.col("name")),
            F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
        )).alias("location"),
    )
    p = raw.select(
        F.col("id").cast("string").alias("server_id"),
        F.explode("prices").alias("p"),
    ).select(
        "server_id",
        F.col("p.location").alias("location"),
        F.col("p.hourly").cast("double").alias("hourly"),
        F.col("p.monthly").cast("double").alias("monthly"),
    ).filter(F.col("hourly").isNotNull() & (F.col("hourly") > 0))
    cap = F.floor(F.col("monthly") / F.col("hourly"))
    tiers = F.array(
        F.struct(F.lit(0.0).alias("lower"),
                 cap.cast("double").cast("string").alias("upper"),
                 F.col("hourly").alias("price")),
        F.struct((cap + 1).cast("double").alias("lower"),
                 F.lit("Infinity").alias("upper"),
                 F.lit(0.0).alias("price")),
    ).cast(_PRICE_TIER_TYPE)
    return (
        p.join(F.broadcast(probe), "location")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id",
            F.col("region_id").alias("zone_id"),
            "server_id",
            F.lit("Linux").alias("operating_system"),
            F.lit("ondemand").alias("allocation"),
            F.lit("hour").alias("unit"),
            F.round("hourly", 4).alias("price"),
            F.when(F.col("monthly").isNotNull(), tiers)
            .otherwise(F.lit(None).cast(_PRICE_TIER_TYPE))
            .alias("price_tiered"),
            F.lit("EUR").alias("currency"),
        )
    )
