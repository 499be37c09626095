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
