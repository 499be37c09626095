"""Declared StructTypes for the sc-crawler silver tables.

The reference declares every table twice (pydantic Base validator +
SQLModel table, table_bases.py:45-117); here each table is a single
StructType and validation is a transform (see operators/validate.py).
Column sets follow /root/reference/src/sc_crawler/table_bases.py (cited
per table); FIXTURES.md §1 is the distilled spec.

SCD Type 2 twins share the schema — ``observed_at`` simply joins the
logical PK (tables_scd.py:45-53) — so PK metadata lives in ``PRIMARY_KEYS``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


S, D, I, L, B, TS = (StringType(), DoubleType(), IntegerType(), LongType(),
                     BooleanType(), TimestampType())

# Lifecycle meta columns on every table (table_bases.py:219-230).
STATUS_COLS = [_f("status", S, False), _f("observed_at", TS, False)]

# Nested JSON structs (table_fields.py:53-152)
CPU_STRUCT = StructType([
    _f("manufacturer", S), _f("family", S), _f("model", S),
    _f("cores", I), _f("threads", I),
    _f("l1_cache_size", I), _f("l2_cache_size", I), _f("l3_cache_size", I),
    _f("microcode", S), _f("capabilities", ArrayType(S)),
    _f("bugs", ArrayType(S)), _f("bogomips", D),
])

GPU_STRUCT = StructType([
    _f("manufacturer", S, False), _f("family", S), _f("model", S),
    _f("memory", L, False), _f("firmware_version", S), _f("bios_version", S),
    _f("graphics_clock", I), _f("sm_clock", I), _f("mem_clock", I),
    _f("video_clock", I),
])

DISK_STRUCT = StructType([
    _f("size", L, False), _f("storage_type", S, False), _f("description", S),
])

# Tiered pricing (table_fields.py:228-257): upper kept as string so the
# reference's float("inf") <-> "Infinity" JSON convention round-trips.
PRICE_TIER_STRUCT = StructType([
    _f("lower", D, False), _f("upper", S, False), _f("price", D, False),
])


def _price_cols() -> list[StructField]:
    """Shared *_price column block (table_bases.py:368-401)."""
    return [
        _f("unit", S, False),
        _f("price", D),
        _f("price_upfront", D),
        _f("price_tiered", ArrayType(PRICE_TIER_STRUCT)),
        _f("currency", S, False),
    ]


COUNTRY = StructType([
    _f("country_id", S, False), _f("continent", S, False), *STATUS_COLS,
])

COMPLIANCE_FRAMEWORK = StructType([
    _f("compliance_framework_id", S, False), _f("name", S, False),
    _f("abbreviation", S), _f("description", S), _f("logo", S),
    _f("homepage", S), *STATUS_COLS,
])

VENDOR = StructType([
    _f("vendor_id", S, False), _f("name", S, False), _f("logo", S),
    _f("homepage", S), _f("country_id", S, False), _f("state", S),
    _f("city", S), _f("address_line", S), _f("zip_code", S),
    _f("founding_year", I), _f("status_page", S),
    _f("stopped_server_charged", B),
    _f("billing_increment_seconds", I), _f("minimum_billing_seconds", I),
    *STATUS_COLS,
])

VENDOR_COMPLIANCE_LINK = StructType([
    _f("vendor_id", S, False), _f("compliance_framework_id", S, False),
    _f("comment", S), *STATUS_COLS,
])

REGION = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("name", S, False), _f("api_reference", S, False),
    _f("display_name", S, False), _f("aliases", ArrayType(S)),
    _f("country_id", S, False), _f("state", S), _f("city", S),
    _f("address_line", S), _f("zip_code", S), _f("lon", D), _f("lat", D),
    _f("founding_year", I), _f("green_energy", B), *STATUS_COLS,
])

ZONE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("zone_id", S, False), _f("name", S, False),
    _f("api_reference", S, False), _f("display_name", S, False),
    *STATUS_COLS,
])

STORAGE = StructType([
    _f("vendor_id", S, False), _f("storage_id", S, False),
    _f("name", S, False), _f("description", S),
    _f("storage_type", S, False), _f("max_iops", L),
    _f("max_throughput", L), _f("min_size", L), _f("max_size", L),
    *STATUS_COLS,
])

# table_bases.py:608-865 — the widest table (~50 cols)
SERVER = StructType([
    _f("vendor_id", S, False), _f("server_id", S, False),
    _f("name", S, False), _f("api_reference", S, False),
    _f("display_name", S, False), _f("description", S),
    _f("family", S), _f("vcpus", I, False), _f("hypervisor", S),
    _f("cpu_allocation", S, False), _f("cpu_cores", I), _f("cpu_speed", D),
    _f("cpu_architecture", S, False), _f("cpu_manufacturer", S),
    _f("cpu_family", S), _f("cpu_model", S),
    _f("cpu_l1d_cache", I), _f("cpu_l1d_cache_total", I),
    _f("cpu_l1i_cache", I), _f("cpu_l1i_cache_total", I),
    _f("cpu_l2_cache", I), _f("cpu_l2_cache_total", I),
    _f("cpu_l3_cache", I), _f("cpu_l3_cache_total", I),
    _f("cpu_flags", ArrayType(S)), _f("cpus", ArrayType(CPU_STRUCT)),
    _f("ecpus", D), _f("scalability", D), _f("hw_virt", B),
    _f("memory_amount", L, False), _f("memory_amount_actual", L),
    _f("memory_generation", S), _f("memory_speed", I), _f("memory_ecc", B),
    _f("gpu_count", D, False), _f("gpu_memory_min", L),
    _f("gpu_memory_total", L), _f("gpu_manufacturer", S),
    _f("gpu_family", S), _f("gpu_model", S),
    _f("gpus", ArrayType(GPU_STRUCT)),
    _f("storage_size", L, False), _f("storage_type", S),
    _f("storages", ArrayType(DISK_STRUCT)),
    _f("network_speed_baseline", D), _f("network_speed_max", D),
    _f("network_storage_speed_baseline", D), _f("network_storage_speed_max", D),
    _f("inbound_traffic", D, False), _f("outbound_traffic", D, False),
    _f("ipv4", I, False), _f("average_time_to_start", D),
    *STATUS_COLS,
])

SERVER_PRICE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("zone_id", S, False), _f("server_id", S, False),
    _f("operating_system", S, False), _f("allocation", S, False),
    *_price_cols(), *STATUS_COLS,
])

SERVER_DESCRIPTION = StructType([
    _f("vendor_id", S, False), _f("server_id", S, False),
    _f("page", ArrayType(S)), _f("description", S),
    _f("og_description", S), _f("meta_description", S),
    _f("tagline", S), _f("bullet_points", ArrayType(S)),
    _f("categories", ArrayType(S)), *STATUS_COLS,
])

STORAGE_PRICE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("storage_id", S, False), *_price_cols(), *STATUS_COLS,
])

DATABASE = StructType([
    _f("vendor_id", S, False), _f("database_id", S, False),
    _f("name", S, False), _f("api_reference", S, False),
    _f("display_name", S, False), _f("description", S),
    _f("server_id", S),            # optional related Server SKU (J7 match)
    _f("engine", S, False), _f("engine_versions", ArrayType(S)),
    _f("family", S), _f("vcpus", I), _f("memory_amount", L),
    _f("storage_size", L), _f("ha_supported", B),
    _f("storage_autoscaling", B), _f("scheduled_backups", B),
    _f("engine_auto_upgrade", B), _f("autotuning", B),
    _f("custom_config", B), _f("custom_extensions", B),
    _f("continuous_backups", I), _f("support_level", S), _f("sla", D),
    *STATUS_COLS,
])

DATABASE_PRICE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("database_id", S, False), _f("allocation", S, False),
    *_price_cols(), *STATUS_COLS,
])

DATABASE_STORAGE = StructType([
    _f("vendor_id", S, False), _f("database_storage_id", S, False),
    _f("name", S, False), _f("description", S),
    _f("scope", S, False), _f("redundancy", S), _f("min_size", L),
    _f("max_size", L), _f("max_iops", L), _f("max_throughput", L),
    *STATUS_COLS,
])

DATABASE_STORAGE_PRICE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("database_storage_id", S, False), *_price_cols(), *STATUS_COLS,
])

TRAFFIC_PRICE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    _f("direction", S, False), *_price_cols(), *STATUS_COLS,
])

IPV4_PRICE = StructType([
    _f("vendor_id", S, False), _f("region_id", S, False),
    *_price_cols(), *STATUS_COLS,
])

BENCHMARK = StructType([
    _f("benchmark_id", S, False), _f("category", S),
    _f("source", S, False),          # JSON discriminated union (kind tag)
    _f("name", S, False), _f("description", S), _f("note", S),
    _f("framework", S, False), _f("config_fields", S, False),  # JSON dict
    _f("measurement", S), _f("unit", S),
    _f("higher_is_better", B, False), *STATUS_COLS,
])

# config is the canonical sorted-key JSON string — part of the PK
# (table_bases.py:1250-1267; MapType can't be a join/group key).
BENCHMARK_SCORE = StructType([
    _f("vendor_id", S, False), _f("server_id", S, False),
    _f("benchmark_id", S, False), _f("config", S, False),
    _f("framework_version", S), _f("kernel_version", S),
    _f("score", D, False), _f("score_breakdown", S), _f("note", S),
    *STATUS_COLS,
])

METADATA = StructType([_f("key", S, False), _f("value", S)])

TABLES: dict[str, StructType] = {
    "country": COUNTRY,
    "compliance_framework": COMPLIANCE_FRAMEWORK,
    "vendor": VENDOR,
    "vendor_compliance_link": VENDOR_COMPLIANCE_LINK,
    "region": REGION,
    "zone": ZONE,
    "storage": STORAGE,
    "server": SERVER,
    "server_price": SERVER_PRICE,
    "server_description": SERVER_DESCRIPTION,
    "storage_price": STORAGE_PRICE,
    "database": DATABASE,
    "database_price": DATABASE_PRICE,
    "database_storage": DATABASE_STORAGE,
    "database_storage_price": DATABASE_STORAGE_PRICE,
    "traffic_price": TRAFFIC_PRICE,
    "ipv4_price": IPV4_PRICE,
    "benchmark": BENCHMARK,
    "benchmark_score": BENCHMARK_SCORE,
    "_metadata": METADATA,
}

# Logical PKs (tables.py:56-776); SCD twins add observed_at.
PRIMARY_KEYS: dict[str, list[str]] = {
    "country": ["country_id"],
    "compliance_framework": ["compliance_framework_id"],
    "vendor": ["vendor_id"],
    "vendor_compliance_link": ["vendor_id", "compliance_framework_id"],
    "region": ["vendor_id", "region_id"],
    "zone": ["vendor_id", "region_id", "zone_id"],
    "storage": ["vendor_id", "storage_id"],
    "server": ["vendor_id", "server_id"],
    "server_price": ["vendor_id", "region_id", "zone_id", "server_id",
                     "allocation"],
    "server_description": ["vendor_id", "server_id"],
    "storage_price": ["vendor_id", "region_id", "storage_id"],
    "database": ["vendor_id", "database_id"],
    "database_price": ["vendor_id", "region_id", "database_id", "allocation"],
    "database_storage": ["vendor_id", "database_storage_id"],
    "database_storage_price": ["vendor_id", "region_id",
                               "database_storage_id"],
    "traffic_price": ["vendor_id", "region_id", "direction"],
    "ipv4_price": ["vendor_id", "region_id"],
    "benchmark": ["benchmark_id"],
    "benchmark_score": ["vendor_id", "server_id", "benchmark_id", "config"],
    "_metadata": ["key"],
}


def scd_primary_keys(table: str) -> list[str]:
    """SCD Type 2 PK: logical PK + observed_at (tables_scd.py:45-53)."""
    return [*PRIMARY_KEYS[table], "observed_at"]
