"""AWS service inventories beyond servers: EBS storage, RDS databases,
database storage, data-transfer (traffic) and public-IPv4 pricing
(SURVEY.md §2.1 S1/S11, §2.4 J7, §2.5 A6/A7, §2.3 P3).

Reference behavior: _aws.py:1169-1758 walks the pricing-API product
dicts row-at-a-time; here each inventory is a declarative DataFrame
transform over bronze-landed JSON lines (one product per line, the same
landing convention as ``instance_types.json``):

- ``storage_products.json``   — EC2 storage volumes (attrs + terms)
- ``rds_products.json``       — RDS products, both "Database Instance"
  and "Database Storage" product families
- ``rds_engine_versions.json``   — one row per major engine version
- ``rds_orderable_options.json`` — orderable-DB-instance options
- ``traffic_products.json``   — data-transfer products with direction
- ``ipv4_products.json``      — public-IPv4 products

All transforms are pure Column expressions (no UDFs); dims broadcast;
the product fact is always the only big side, so at 100 TB each
inventory is a scan + broadcast joins + one aggregate at most.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import extract_last_number, round_price
from .aws import (
    TERMS_SCHEMA, extract_ondemand_price, extract_ondemand_prices,
    first_engine_version_options, match_database_servers,
    storage_option_bounds,
)

# utils.py:16-19 — binary-prefix to SI conversions
_GIB_TO_GB = (1024 ** 3) / (1000 ** 3)
_MIB_TO_MB = (1024 ** 2) / (1000 ** 2)

# _aws.py:1123-1167 — documented EBS limits the pricing API omits
STORAGE_MANUAL_DATA: dict[str, dict[str, float]] = {
    "standard": {"maxIopsvolume": 200, "maxThroughputvolume": 90,
                 "minVolumeSize": 1, "maxVolumeSize": 1},
    "gp2": {"maxIopsvolume": 16_000, "maxThroughputvolume": 250,
            "minVolumeSize": 1, "maxVolumeSize": 16},
    "gp3": {"maxIopsvolume": 80_000, "maxThroughputvolume": 2_000,
            "minVolumeSize": 1, "maxVolumeSize": 64},
    "st1": {"maxIopsvolume": 500, "maxThroughputvolume": 500,
            "minVolumeSize": 125, "maxVolumeSize": 16},
    "sc1": {"maxIopsvolume": 250, "maxThroughputvolume": 250,
            "minVolumeSize": 125, "maxVolumeSize": 16},
    "io1": {"maxIopsvolume": 64_000, "maxThroughputvolume": 1_000,
            "minVolumeSize": 4, "maxVolumeSize": 16},
    "io2": {"maxIopsvolume": 256_000, "maxThroughputvolume": 4_000,
            "minVolumeSize": 4, "maxVolumeSize": 64},
}

# _aws.py:1684-1690 — RDS volumeType display name <-> storage id
DATABASE_STORAGE_MAPPING = {
    "standard": "Magnetic",
    "gp2": "General Purpose",
    "gp3": "General Purpose-GP3",
    "io1": "Provisioned IOPS",
    "io2": "Provisioned IOPS-IO2",
}

RAW_STORAGE_PRODUCT = (
    "volume_api_name string, volume_type string, storage_media string, "
    "max_iops_volume string, max_throughput_volume string, "
    "min_volume_size string, max_volume_size string, location string, "
    "terms string"
)

RAW_RDS_PRODUCT = (
    "product_family string, deployment_option string, region_code string, "
    "instance_type string, instance_family string, vcpu int, "
    "memory string, storage string, volume_type string, terms string"
)

RAW_ORDERABLE_OPTION = (
    "db_instance_class string, engine_version string, "
    "multi_az_capable boolean, supports_storage_autoscaling boolean, "
    "storage_type string, min_storage_size long, max_storage_size long, "
    "max_iops_per_db_instance long, max_storage_throughput_per_db_instance long"
)

RAW_TRAFFIC_PRODUCT = "direction string, location string, terms string"

RAW_SPOT_PRICE = (
    "availability_zone string, instance_type string, spot_price string, "
    "timestamp string"
)

RAW_IPV4_PRODUCT = "location string, terms string"


def region_probe(regions: DataFrame) -> DataFrame:
    """Alias-aware (region_id, location) probe table: region name plus
    every alias becomes a lookup row (scmodels_to_dict keys=["name",
    "aliases"], utils.py). Always the broadcast side."""
    return regions.select(
        "region_id",
        F.explode(
            F.array_union(
                F.array(F.col("name")),
                F.coalesce(F.col("aliases"), F.array().cast("array<string>")),
            )
        ).alias("location"),
    )


def _manual_lookup(key: str) -> Column:
    """Map literal over STORAGE_MANUAL_DATA for one attribute — the
    documented fallback when the pricing API omits a limit."""
    pairs: list[Column] = []
    for pid, attrs in STORAGE_MANUAL_DATA.items():
        pairs += [F.lit(pid), F.lit(float(attrs[key]))]
    return F.create_map(*pairs)[F.col("volume_api_name")]


def _attr_or_manual(col: str, key: str) -> Column:
    """extract_last_number(attr) with the manual-data fallback
    (_aws.py:1192-1200): the API value wins when present."""
    return F.coalesce(extract_last_number(F.col(col)), _manual_lookup(key))


def storage_catalog(raw: DataFrame, vendor_id: str = "aws") -> DataFrame:
    """EBS volume types -> ``storage`` rows (_aws.py:1169-1220).

    One row per volume_api_name (the catalog is looked up in us-east-1
    first; other locations only break ties deterministically). Unit
    conversions follow the reference: throughput MiB/s -> MB/s, min size
    GiB -> GB, max size TiB -> GB.
    """
    w = Window.partitionBy("volume_api_name").orderBy(
        F.when(F.col("location") == "US East (N. Virginia)", 0).otherwise(1),
        "location",
    )
    first = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return first.select(
        F.lit(vendor_id).alias("vendor_id"),
        F.col("volume_api_name").alias("storage_id"),
        F.col("volume_type").alias("name"),
        F.col("storage_media").alias("description"),
        F.when(F.col("storage_media").contains("HDD"), F.lit("hdd"))
        .otherwise(F.lit("ssd")).alias("storage_type"),
        _attr_or_manual("max_iops_volume", "maxIopsvolume")
        .cast("long").alias("max_iops"),
        F.round(_attr_or_manual("max_throughput_volume", "maxThroughputvolume")
                * F.lit(_MIB_TO_MB)).cast("long").alias("max_throughput"),
        F.round(_attr_or_manual("min_volume_size", "minVolumeSize")
                * F.lit(_GIB_TO_GB)).cast("long").alias("min_size"),
        F.round(_attr_or_manual("max_volume_size", "maxVolumeSize")
                * F.lit(1024) * F.lit(_GIB_TO_GB)).cast("long").alias("max_size"),
    )


def assemble_storage_prices(raw: DataFrame, regions: DataFrame,
                            vendor_id: str = "aws") -> DataFrame:
    """EBS products x all regions -> ``storage_price`` rows
    (_aws.py:1222-1266): GB/month ondemand price per (region, volume)."""
    priced = raw.select(
        F.col("volume_api_name").alias("storage_id"),
        F.col("location"),
        round_price(
            extract_ondemand_price(F.from_json("terms", TERMS_SCHEMA))
        ).alias("price"),
    ).filter(F.col("price").isNotNull())
    return (
        priced.join(F.broadcast(region_probe(regions)), "location")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id", "storage_id",
            F.lit("GB").alias("unit"),
            "price",
            F.lit("USD").alias("currency"),
        )
    )


def _memory_mib(memory: Column) -> Column:
    """'8 GiB' -> 8192 (MiB, _aws.py:1596-1599)."""
    return (extract_last_number(memory) * 1024).cast("long")


def _bundled_storage_gb(storage: Column) -> Column:
    """'1 x 75 NVMe SSD' -> 75; 'EBS only' / unparseable -> NULL
    (_extract_rds_bundled_storage_size, _aws.py:1519-1529)."""
    n = F.regexp_extract(storage, r"^\s*(\d+)\s*[xX]\s*(\d+)", 1)
    size = F.regexp_extract(storage, r"^\s*(\d+)\s*[xX]\s*(\d+)", 2)
    return F.when(
        (n != "") & (size != ""), n.cast("long") * size.cast("long")
    )


def standardize_databases(rds: DataFrame, servers: DataFrame,
                          engine_versions: DataFrame, options: DataFrame,
                          vendor_id: str = "aws") -> DataFrame:
    """RDS "Database Instance" products -> ``database`` rows
    (inventory_databases, _aws.py:1541-1613).

    One row per instance class, attributes taken from the
    priority-region row (us-east-1 first — _active_region_ids,
    _aws.py:1397-1403); server matched by stripping the ``db.`` prefix
    (J7); HA/autoscaling flags folded from the orderable options of the
    FIRST engine version per class (W3); engine versions attached as one
    sorted array (the corpus-wide dim is a one-row broadcast).
    """
    inst = rds.filter(
        (F.col("product_family") == "Database Instance")
        & (F.col("deployment_option") == "Single-AZ")
    )
    pri = (
        F.when(F.col("region_code") == "us-east-1", 0)
        .when(F.col("region_code") == "eu-west-1", 1)
        .when(F.col("region_code") == "eu-central-1", 2)
        .otherwise(3)
    )
    w = Window.partitionBy("instance_type").orderBy(pri, "region_code")
    first = (
        inst.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    # option flags per class, restricted to the first engine version
    # (the reference's orderable lookup truncates the same way)
    opts = first_engine_version_options(
        options, group_cols=["db_instance_class"]
    )
    flags = opts.groupBy(
        F.col("db_instance_class").alias("database_id")
    ).agg(
        F.max("multi_az_capable").alias("ha_supported"),
        F.max("supports_storage_autoscaling").alias("storage_autoscaling"),
    )
    versions = engine_versions.agg(
        F.array_sort(F.collect_set("version")).alias("engine_versions")
    )
    mem_gib = extract_last_number(F.col("memory"))
    storage_gb = _bundled_storage_gb(F.col("storage"))
    base = first.select(
        F.lit(vendor_id).alias("vendor_id"),
        F.col("instance_type").alias("database_id"),
        F.col("instance_type").alias("name"),
        F.col("instance_type").alias("api_reference"),
        F.col("instance_type").alias("display_name"),
        F.lit("postgresql").alias("engine"),
        F.col("instance_family").alias("family"),
        F.col("vcpu").alias("vcpus"),
        _memory_mib(F.col("memory")).alias("memory_amount"),
        storage_gb.alias("storage_size"),
        # the reference synthesizes the description from the same fields
        F.when(
            storage_gb.isNotNull(),
            F.format_string("%s (%d vCPU, %s GiB RAM, %d GB NVMe SSD)",
                            F.col("instance_family"), F.col("vcpu"),
                            mem_gib.cast("string"), storage_gb),
        ).otherwise(
            F.format_string("%s (%d vCPU, %s GiB RAM)",
                            F.col("instance_family"), F.col("vcpu"),
                            mem_gib.cast("string")),
        ).alias("description"),
        F.lit(True).alias("scheduled_backups"),     # managed RDS default
        F.lit(35).alias("continuous_backups"),      # product PITR max
    )
    out = (
        base.join(F.broadcast(flags), "database_id", "left")
        .crossJoin(F.broadcast(versions))
        .withColumn("ha_supported", F.coalesce("ha_supported", F.lit(False)))
        .withColumn("storage_autoscaling",
                    F.coalesce("storage_autoscaling", F.lit(False)))
    )
    return match_database_servers(out, servers)


def assemble_database_prices(rds: DataFrame, regions: DataFrame,
                             vendor_id: str = "aws") -> DataFrame:
    """RDS instance products x active regions -> ``database_price``
    (inventory_database_prices, _aws.py:1616-1667): hourly ondemand
    Single-AZ price per (region, class)."""
    inst = rds.filter(
        (F.col("product_family") == "Database Instance")
        & (F.col("deployment_option") == "Single-AZ")
    )
    active = regions.select("region_id").distinct()
    return (
        inst.select(
            F.col("region_code").alias("region_id"),
            F.col("instance_type").alias("database_id"),
            round_price(
                extract_ondemand_price(F.from_json("terms", TERMS_SCHEMA))
            ).alias("price"),
        )
        .filter(F.col("price").isNotNull())
        .join(F.broadcast(active), "region_id", "left_semi")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id", "database_id",
            F.lit("ondemand").alias("allocation"),
            F.lit("hour").alias("unit"),
            "price",
            F.lit(0.0).alias("price_upfront"),
            F.lit("USD").alias("currency"),
        )
    )


def database_storage_catalog(options: DataFrame,
                             vendor_id: str = "aws") -> DataFrame:
    """Orderable-option rows -> ``database_storage`` rows
    (inventory_database_storages, _aws.py:1670-1704): per-storage-type
    bounds fold (A7) + the documented display-name mapping."""
    opts = first_engine_version_options(
        options, group_cols=["db_instance_class"]
    ).select(
        F.lit(vendor_id).alias("vendor_id"),
        F.lower(F.col("storage_type")).alias("storage_type"),
        F.col("min_storage_size").alias("min_size"),
        F.col("max_storage_size").alias("max_size"),
        F.col("max_iops_per_db_instance").alias("max_iops"),
        F.col("max_storage_throughput_per_db_instance").alias("max_throughput"),
        F.col("multi_az_capable").alias("multi_az"),
    ).filter(F.col("storage_type").isNotNull() & (F.col("storage_type") != ""))
    bounds = storage_option_bounds(opts)
    name_map = F.create_map(*[
        F.lit(x) for kv in DATABASE_STORAGE_MAPPING.items() for x in kv
    ])
    return bounds.select(
        "vendor_id",
        F.col("storage_type").alias("database_storage_id"),
        name_map[F.col("storage_type")].alias("name"),
        F.when(F.col("storage_type") == "standard", F.lit("HDD-backed"))
        .otherwise(F.lit("SSD-backed")).alias("description"),
        F.lit("data").alias("scope"),
        "min_size", "max_size", "max_iops", "max_throughput",
    ).filter(F.col("name").isNotNull())


def assemble_database_storage_prices(rds: DataFrame, regions: DataFrame,
                                     storages: DataFrame,
                                     vendor_id: str = "aws") -> DataFrame:
    """RDS "Database Storage" products -> ``database_storage_price``
    (inventory_database_storage_prices, _aws.py:1707-1758): volumeType
    display name mapped back to the storage id, gated on the landed
    database_storage catalog, GB/month unit."""
    rev_map = F.create_map(*[
        F.lit(x) for k, v in DATABASE_STORAGE_MAPPING.items() for x in (v, k)
    ])
    stor = rds.filter(F.col("product_family") == "Database Storage").select(
        F.col("region_code").alias("region_id"),
        rev_map[F.col("volume_type")].alias("database_storage_id"),
        round_price(
            extract_ondemand_price(F.from_json("terms", TERMS_SCHEMA))
        ).alias("price"),
    ).filter(
        F.col("price").isNotNull() & F.col("database_storage_id").isNotNull()
    )
    active = regions.select("region_id").distinct()
    known = storages.select("database_storage_id").distinct()
    return (
        stor.join(F.broadcast(active), "region_id", "left_semi")
        .join(F.broadcast(known), "database_storage_id", "left_semi")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id", "database_storage_id",
            F.lit("GB").alias("unit"),
            "price",
            F.lit(0.0).alias("price_upfront"),
            F.lit("USD").alias("currency"),
        )
    )


def assemble_traffic_prices(raw: DataFrame, regions: DataFrame,
                            vendor_id: str = "aws") -> DataFrame:
    """Data-transfer products -> ``traffic_price`` rows with the FULL
    tier array (inventory_traffic_prices, _aws.py:1268-1309).

    The reference applies ``fix_1024`` to the tier BOUNDS (the API
    reports GiB where the homepage shows GB): lower/upper scale by
    1000/1024; the headline ``price`` is the max tier price; the tiers
    themselves land in ``price_tiered`` (P3 array, F5 Infinity
    convention preserved through the string-typed upper bound).
    """
    tiers = extract_ondemand_prices(F.from_json("terms", TERMS_SCHEMA))
    fixed = F.transform(
        tiers,
        lambda t: F.struct(
            (t["lower"] / 1024 * 1000).alias("lower"),
            F.when(t["upper"] == "Infinity", F.lit("Infinity"))
            .otherwise(
                (t["upper"].cast("double") / 1024 * 1000).cast("string")
            ).alias("upper"),
            t["price"].alias("price"),
        ),
    )
    priced = raw.select(
        "direction", "location", fixed.alias("price_tiered")
    ).filter(F.size("price_tiered") > 0)
    return (
        priced.join(F.broadcast(region_probe(regions)), "location")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id", "direction",
            F.lit("GB").alias("unit"),
            round_price(
                F.array_max(F.transform(F.col("price_tiered"),
                                        lambda t: t["price"]))
            ).alias("price"),
            F.col("price_tiered"),
            F.lit("USD").alias("currency"),
        )
    )


def assemble_spot_prices(raw: DataFrame, servers: DataFrame,
                         zone_offerings: DataFrame,
                         vendor_id: str = "aws") -> DataFrame:
    """Spot price history -> ``server_price`` rows with allocation='spot'
    (inventory_server_prices_spot, _aws.py:1044-1110).

    Zone resolved through the landed zone offerings (broadcast), server
    gated on the standardized catalog (unknown SKUs dropped, like the
    reference's KeyError skip), and ``observed_at`` comes from the
    REPORTED price timestamp, not ingestion time (T4 semantics). The
    history contains many reports per (zone, server); keep-last on the
    reported time (A4) picks the current price so the batch has unique
    PKs before the merge.
    """
    from ..operators.windows import keep_last_dedup

    zone_map = zone_offerings.select(
        "region_id", F.explode("zones").alias("zone_id")
    )
    priced = raw.select(
        F.col("availability_zone").alias("zone_id"),
        F.col("instance_type").alias("server_id"),
        round_price(F.col("spot_price").cast("double")).alias("price"),
        F.to_timestamp("timestamp").alias("observed_at"),
    ).filter(F.col("price").isNotNull())
    rows = (
        priced.join(F.broadcast(zone_map), "zone_id")
        .join(F.broadcast(servers.select("server_id")), "server_id", "left_semi")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id", "zone_id", "server_id",
            F.lit("Linux").alias("operating_system"),
            F.lit("spot").alias("allocation"),
            F.lit("hour").alias("unit"),
            "price",
            F.lit("USD").alias("currency"),
            "observed_at",
        )
    )
    return keep_last_dedup(
        rows,
        ["vendor_id", "region_id", "zone_id", "server_id", "allocation"],
        "observed_at",
    )


def assemble_ipv4_prices(raw: DataFrame, regions: DataFrame,
                         vendor_id: str = "aws") -> DataFrame:
    """Public-IPv4 products -> ``ipv4_price`` rows (inventory_ipv4_prices,
    _aws.py:1312-1349): hourly in-use address price per region."""
    priced = raw.select(
        "location",
        round_price(
            extract_ondemand_price(F.from_json("terms", TERMS_SCHEMA))
        ).alias("price"),
    ).filter(F.col("price").isNotNull())
    return (
        priced.join(F.broadcast(region_probe(regions)), "location")
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id",
            F.lit("hour").alias("unit"),
            "price",
            F.lit("USD").alias("currency"),
        )
    )
