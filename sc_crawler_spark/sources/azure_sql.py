"""Azure Database for PostgreSQL Flexible Server inventories (reference
_azure.py:1527-2046): database catalog from the capabilities API,
per-region compute prices from the Retail Prices feed, storage editions
and their GB/month prices.

Bronze contract:

- ``pg_capabilities.json`` — one row per (location, edition, sku) with
  the storage editions' bounds flattened alongside:
  {location, edition, sku_name, v_cores, memory_per_vcore_mb,
  engine_versions, storage_editions: [{name, reason, min_mb, max_mb,
  max_iops, max_throughput}]}
- the shared ``retail_prices.json`` (see sources/azure.py) — Flexible
  Server rows carry product_name / meter_name / arm_sku_name /
  sku_name.

Scope note: the retail price lookup implements the reference's direct
matches (armSkuName == database_id, the Standard_-stripped alias, and
the flat-priced burstable meters) plus the per-vCore meter conversion;
the deep series-fallback chain (_azure.py:1661-1687) that guesses a
price from family/series tokens when no arm name matches is NOT
reproduced — SKUs without a direct retail row are skipped, which the
reference also treats as skippable (price_item None -> continue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .azure import STORAGE_PRICE_UNIT_MAPPING, _region_probe_api

RAW_PG_CAPABILITY = (
    "location string, edition string, sku_name string, v_cores int, "
    "memory_per_vcore_mb long, engine_versions array<string>, "
    "storage_editions array<struct<name:string,reason:string,min_mb:long,"
    "max_mb:long,max_iops:long,max_throughput:long>>"
)

# _azure.py:1583-1601
_FLAT_COMPUTE_SKUS = ("B1MS", "B2S")
_FLEX_STORAGE_PRODUCT = "Az DB for PostgreSQL Flexible Server Storage"
_FLEX_BACKUP_PRODUCT = (
    "Azure Database for PostgreSQL Flexible Server Backup Storage")
_STORAGE_RETAIL_TO_ID = {
    "storage data stored": "ManagedDisk",
    "premium ssd v2 storage data stored": "ManagedDiskV2",
    "ultra disk storage data stored": "UltraDisk",
}
_STORAGE_DESCRIPTIONS = {
    "ManagedDisk": "Premium SSD managed disk",
    "ManagedDiskV2": "Premium SSD v2 managed disk",
    "UltraDisk": "Ultra disk managed storage",
}
_BACKUP_STORAGE_ID = "BackupStorageLRS"
_UNSUPPORTED_REASON = "Specified Storage Edition not supported in this region."


def azure_pg_databases(caps: DataFrame,
                       vendor_id: str = "azure") -> DataFrame:
    """Capability SKUs -> ``database`` rows (inventory_databases,
    _azure.py:1723-1785): one row per SKU name with engine versions
    unioned across locations (A6 group-merge), memory = per-vCore MB x
    cores, HA supported except on the Burstable edition, the related
    server is the SKU name itself."""
    mem = F.when(
        F.col("v_cores").isNotNull()
        & F.col("memory_per_vcore_mb").isNotNull(),
        (F.col("memory_per_vcore_mb") * F.col("v_cores")).cast("long"))
    spec = F.concat_ws(", ", F.filter(
        F.array(
            F.when(F.col("v_cores").isNotNull(), F.concat(
                F.col("v_cores").cast("string"),
                F.when(F.col("v_cores") != 1, F.lit(" vCPUs"))
                .otherwise(F.lit(" vCPU")))),
            F.when(mem.isNotNull(), F.concat(
                F.floor(mem / 1024).cast("string"), F.lit(" GB RAM"))),
        ),
        lambda c: c.isNotNull(),
    ))
    description = F.concat(
        F.lit("PostgreSQL "), F.col("edition"),
        F.when(spec != "", F.concat(F.lit(" ("), spec, F.lit(")")))
        .otherwise(F.lit("")),
    )
    rows = caps.filter(
        F.col("sku_name").isNotNull() & (F.col("sku_name") != "")
    ).select(
        F.col("sku_name").alias("database_id"),
        F.col("edition"),
        F.col("v_cores").alias("vcpus"),
        mem.alias("memory_amount"),
        description.alias("description"),
        F.col("engine_versions"),
    )
    return rows.groupBy("database_id").agg(
        F.first("edition", ignorenulls=True).alias("family"),
        F.first("vcpus", ignorenulls=True).alias("vcpus"),
        F.first("memory_amount", ignorenulls=True).alias("memory_amount"),
        F.first("description", ignorenulls=True).alias("description"),
        F.array_sort(F.array_distinct(
            F.flatten(F.collect_list("engine_versions"))))
        .alias("engine_versions"),
    ).select(
        F.lit(vendor_id).alias("vendor_id"),
        "database_id",
        F.regexp_replace("database_id", r"^Standard_", "").alias("name"),
        F.col("database_id").alias("api_reference"),
        F.regexp_replace("database_id", r"^Standard_", "")
        .alias("display_name"),
        "description",
        F.col("database_id").alias("server_id"),
        F.lit("postgresql").alias("engine"),
        "engine_versions", "family", "vcpus", "memory_amount",
        F.lit(None).cast("long").alias("storage_size"),
        (F.col("family") != "Burstable").alias("ha_supported"),
        F.lit(None).cast("boolean").alias("storage_autoscaling"),
        F.lit(None).cast("boolean").alias("scheduled_backups"),
        F.lit(35).alias("continuous_backups"),
    )


def azure_pg_database_prices(caps: DataFrame, retail: DataFrame,
                             regions: DataFrame,
                             vendor_id: str = "azure") -> DataFrame:
    """Retail compute rows matched to capability SKUs per region
    (inventory_database_prices, _azure.py:1788-1851): direct armSkuName
    match or the Standard_-stripped alias; flat burstable meters price
    as-is, '<family> vCore' meters multiply by the SKU's cores."""
    compute = retail.filter(
        F.lower(F.coalesce(F.col("product_name"), F.lit("")))
        .contains("compute")
        | F.coalesce(F.col("arm_sku_name"), F.lit("")).startswith("Standard_")
        | F.upper(F.coalesce(F.col("arm_sku_name"), F.lit("")))
        .isin(*_FLAT_COMPUTE_SKUS)
        | F.upper(F.coalesce(F.col("meter_name"), F.lit("")))
        .isin(*_FLAT_COMPUTE_SKUS)
    ).withColumn("_pos", F.monotonically_increasing_id())
    skus = caps.select(
        "location", F.col("sku_name").alias("database_id"), "v_cores"
    ).filter(F.col("database_id").isNotNull()).distinct()
    probe = _region_probe_api(regions).withColumnRenamed(
        "arm_region_name", "location")
    sk = skus.join(F.broadcast(probe), "location")
    alias = F.regexp_replace(F.col("database_id"), r"^Standard_", "")
    joined = sk.join(
        compute,
        (F.col("arm_region_name") == F.col("location"))
        & ((F.col("arm_sku_name") == F.col("database_id"))
           | (F.col("arm_sku_name") == alias)
           | (F.upper(F.col("arm_sku_name")) == F.upper(alias))),
    )
    meter = F.coalesce(F.col("meter_name"), F.lit(""))
    arm = F.coalesce(F.col("arm_sku_name"), F.lit(""))
    flat = F.upper(meter).isin(*_FLAT_COMPUTE_SKUS) \
        | F.upper(arm).isin(*_FLAT_COMPUTE_SKUS)
    per_vcore = meter.endswith(" vCore") & (meter != "vCore")
    price = F.when(flat, F.col("retail_price")).when(
        per_vcore,
        F.col("retail_price") * F.coalesce(F.col("v_cores"), F.lit(1)),
    ).otherwise(F.col("retail_price"))
    w = Window.partitionBy("region_id", "database_id").orderBy("_pos")
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.lit(vendor_id).alias("vendor_id"),
            "region_id", "database_id",
            F.lit("ondemand").alias("allocation"),
            F.lit("hour").alias("unit"),
            F.round(price, 4).alias("price"),
            F.lit(0.0).alias("price_upfront"),
            F.coalesce(F.col("currency_code"), F.lit("USD")).alias("currency"),
        )
    )


def azure_pg_database_storages(caps: DataFrame,
                               vendor_id: str = "azure") -> DataFrame:
    """Storage editions folded across regions/editions (A7 bounds,
    inventory_database_storages, _azure.py:1853-1996) plus the static
    backup-storage row (scope=backup, LRS)."""
    ed = caps.select(F.explode("storage_editions").alias("s")).filter(
        (F.coalesce(F.col("s.reason"), F.lit("")) != _UNSUPPORTED_REASON)
        & F.col("s.name").isNotNull() & (F.col("s.name") != "")
    )
    bounds = ed.groupBy(F.col("s.name").alias("database_storage_id")).agg(
        F.floor(F.min("s.min_mb") / 1024).cast("long").alias("min_size"),
        F.floor(F.max("s.max_mb") / 1024).cast("long").alias("max_size"),
        F.max("s.max_iops").alias("max_iops"),
        F.max("s.max_throughput").alias("max_throughput"),
    )
    desc_map = F.create_map(*[
        F.lit(x) for kv in _STORAGE_DESCRIPTIONS.items() for x in kv
    ])
    description = F.concat_ws(", ", F.filter(
        F.array(
            F.coalesce(desc_map[F.col("database_storage_id")],
                       F.col("database_storage_id")),
            F.when(F.col("min_size").isNotNull()
                   & F.col("max_size").isNotNull(),
                   F.format_string("%d-%d GB", F.col("min_size"),
                                   F.col("max_size"))),
            F.when(F.col("max_iops").isNotNull(),
                   F.format_string("up to %d IOPS", F.col("max_iops"))),
            F.when(F.col("max_throughput").isNotNull(),
                   F.format_string("up to %d MB/s throughput",
                                   F.col("max_throughput"))),
        ),
        lambda c: c.isNotNull(),
    ))
    data_rows = bounds.select(
        F.lit(vendor_id).alias("vendor_id"),
        "database_storage_id",
        F.col("database_storage_id").alias("name"),
        description.alias("description"),
        F.lit("data").alias("scope"),
        F.lit(None).cast("string").alias("redundancy"),
        "min_size", "max_size", "max_iops", "max_throughput",
    )
    backup = caps.sparkSession.createDataFrame(
        [(vendor_id, _BACKUP_STORAGE_ID, _BACKUP_STORAGE_ID,
          "Flexible Server backup storage (locally redundant)",
          "backup", "LRS", None, None, None, None)],
        data_rows.schema,
    )
    return data_rows.unionByName(backup)


def azure_pg_database_storage_prices(retail: DataFrame, storages: DataFrame,
                                     regions: DataFrame,
                                     vendor_id: str = "azure") -> DataFrame:
    """Flexible Server storage/backup meters -> GB/month prices
    (inventory_database_storage_prices, _azure.py:1998-2046), gated on
    the landed storage catalog and converted via the shared capacity
    unit multipliers."""
    meter = F.lower(F.coalesce(F.col("meter_name"), F.lit("")))
    id_map = F.create_map(*[
        F.lit(x) for kv in _STORAGE_RETAIL_TO_ID.items() for x in kv
    ])
    storage_id = F.when(
        F.col("product_name") == _FLEX_STORAGE_PRODUCT, id_map[meter]
    ).when(
        (F.col("product_name") == _FLEX_BACKUP_PRODUCT)
        & (meter == "backup storage lrs data stored"),
        F.lit(_BACKUP_STORAGE_ID),
    )
    unit_map = F.create_map(*[
        F.lit(x) for kv in STORAGE_PRICE_UNIT_MAPPING.items() for x in kv
    ])
    known = storages.select("database_storage_id").distinct()
    rows = (
        retail.withColumn("database_storage_id", storage_id)
        .filter(F.col("database_storage_id").isNotNull())
        .withColumn("_mult", unit_map[F.col("unit_of_measure")])
        .filter(F.col("_mult").isNotNull())
        .join(F.broadcast(known), "database_storage_id", "left_semi")
        .join(F.broadcast(_region_probe_api(regions)), "arm_region_name")
        .dropDuplicates(["region_id", "database_storage_id"])
    )
    return rows.select(
        F.lit(vendor_id).alias("vendor_id"),
        "region_id", "database_storage_id",
        F.lit("GB").alias("unit"),
        F.round(F.col("retail_price") * F.col("_mult"), 6).alias("price"),
        F.lit(0.0).alias("price_upfront"),
        F.coalesce(F.col("currency_code"), F.lit("USD")).alias("currency"),
    )
