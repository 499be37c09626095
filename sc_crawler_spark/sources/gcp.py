"""GCP derived pricing (SURVEY.md §2.4 J4; _gcp.py:353-439).

The reference prices a GCP machine type as
``cpu_rate[family, region, allocation] * vcpus +
ram_rate[family, region, allocation] * memory_GiB``,
falling back to a per-instance rate when no component rates exist
(_gcp.py:397-410). Here: one broadcast join of servers against the rate
dimension + arithmetic projection — rates are tiny, facts are wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import round_price


def derive_server_prices(servers: DataFrame, rates: DataFrame,
                         allocation: str = "ondemand") -> DataFrame:
    """servers: (vendor_id, server_id, family, vcpus, memory_amount[MiB],
    region_id). rates: (family, region_id, allocation, resource_group
    in {CPU, RAM, INSTANCE}, rate). Returns server_price rows with the
    derived hourly price (4-decimal rounded, tables.py:263-283)."""
    r = rates.filter(F.col("allocation") == allocation)
    cpu = r.filter(F.col("resource_group") == "CPU").select(
        "family", "region_id", F.col("rate").alias("cpu_rate")
    )
    ram = r.filter(F.col("resource_group") == "RAM").select(
        "family", "region_id", F.col("rate").alias("ram_rate")
    )
    inst = r.filter(F.col("resource_group") == "INSTANCE").select(
        "family", "region_id", F.col("rate").alias("instance_rate")
    )
    j = (
        servers.join(F.broadcast(cpu), ["family", "region_id"], "left")
        .join(F.broadcast(ram), ["family", "region_id"], "left")
        .join(F.broadcast(inst), ["family", "region_id"], "left")
    )
    component = (
        F.col("cpu_rate") * F.col("vcpus")
        + F.col("ram_rate") * F.col("memory_amount") / F.lit(1024.0)
    )
    price = F.coalesce(component, F.col("instance_rate"))
    return (
        j.filter(price.isNotNull())
        .select(
            "vendor_id", "region_id", "server_id",
            F.lit(allocation).alias("allocation"),
            round_price(price).alias("price"),
            F.lit("USD").alias("currency"),
            F.lit("hour").alias("unit"),
        )
    )


def sku_rate_from_pricing_info(units_col: str = "units",
                               nanos_col: str = "nanos") -> F.Column:
    """Billing-SKU unit price: units + nanos/1e9 (_gcp.py tiered_rates)."""
    return F.col(units_col).cast("double") + F.col(nanos_col) / F.lit(1e9)


def stack_premium_rates(rates: DataFrame, base_family: str = "m1",
                        premium_family: str = "m2") -> DataFrame:
    """m2 SKU prices are PREMIUMS on top of m1 (_gcp.py:274-284): for the
    CPU and RAM resource groups, the effective m2 rate per (region,
    allocation) is ``m1_rate + m2_premium``. INSTANCE rows and every
    other family pass through unchanged.

    One broadcast join of the (tiny) premium slice against the (tiny)
    base slice — the rate dimension never exceeds families × regions ×
    allocations rows, so this is driver-free constant-folding territory
    at any fact scale. Where the base family has no rate for a premium
    row's (region, allocation) the stacked rate is NULL (the reference
    raises; here the row is dropped downstream by the price NULL gate
    in :func:`derive_server_prices`).
    """
    keys = ["region_id", "allocation", "resource_group"]
    component = F.col("resource_group").isin("CPU", "RAM")
    prem = rates.filter((F.col("family") == premium_family) & component)
    base = (
        rates.filter((F.col("family") == base_family) & component)
        .select(*keys, F.col("rate").alias("_base_rate"))
    )
    stacked = (
        prem.join(F.broadcast(base), keys, "left")
        .withColumn("rate", F.col("rate") + F.col("_base_rate"))
        .select(*rates.columns)
    )
    passthrough = rates.filter(
        (F.col("family") != premium_family) | ~component
    )
    return passthrough.unionByName(stacked)


def explode_zone_prices(region_prices: DataFrame, zones: DataFrame,
                        zone_inventory: DataFrame) -> DataFrame:
    """Region-level price rows -> per-zone rows, gated on actual
    machine-type availability in each zone (_gcp.py:82-85, 420-422).

    The reference loops ``for zone in region.zones: if _server_in_zone``;
    here it's one broadcast join against the (region_id, zone_id) dim to
    fan out, then a LEFT SEMI join against the (zone_id, server_id)
    inventory to keep only real placements (J5 existence gate). At scale
    the semi-join shuffles on (zone_id, server_id) once; the zone dim is
    always broadcastable.
    """
    per_zone = region_prices.join(F.broadcast(zones), "region_id")
    return per_zone.join(
        zone_inventory.select("zone_id", "server_id").distinct(),
        ["zone_id", "server_id"], "left_semi",
    )
