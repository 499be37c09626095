"""Name-grammar parsers (SURVEY.md §2.3 P10) as regexp_extract projections.

- Azure VM size names: ``Standard_E16-8ds_v5`` -> family E, vcpus 16,
  constrained vcpus 8, features "ds", version 5 (_azure.py:298-451).
- UpCloud plan names: ``HICPU-8xCPU-16GB`` -> family HICPU, vcpus 8,
  memory 16384 MiB (_upcloud.py:94-124).

Pure native regex — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AZURE_RE = r"^(Standard|Basic)_([A-Z]+)([0-9]+)(?:-([0-9]+))?([a-z]*)(?:_([A-Za-z]+))?(?:_v([0-9]+))?$"


def parse_azure_vm_name(name: Column) -> Column:
    """Struct(tier, family, vcpus, vcpus_constrained, features, accelerator,
    version) from an Azure size name; NULL-filled on non-matches."""
    def grp(i: int) -> Column:
        return F.nullif(F.regexp_extract(name, _AZURE_RE, i), F.lit(""))

    return F.struct(
        grp(1).alias("tier"),
        grp(2).alias("family"),
        grp(3).cast("int").alias("vcpus"),
        grp(4).cast("int").alias("vcpus_constrained"),
        grp(5).alias("features"),
        grp(6).alias("accelerator"),
        grp(7).cast("int").alias("version"),
    )


_UPCLOUD_RE = r"^([A-Z]+)-([0-9]+)xCPU-([0-9]+)GB(?:-([0-9]+)x?([A-Z0-9]+))?$"


def parse_upcloud_plan(name: Column) -> Column:
    """Struct(family, vcpus, memory_mib, extra_count, extra_kind) from an
    UpCloud plan name like HICPU-8xCPU-16GB."""
    def grp(i: int) -> Column:
        return F.nullif(F.regexp_extract(name, _UPCLOUD_RE, i), F.lit(""))

    return F.struct(
        grp(1).alias("family"),
        grp(2).cast("int").alias("vcpus"),
        (grp(3).cast("long") * 1024).alias("memory_mib"),
        grp(4).cast("int").alias("extra_count"),
        grp(5).alias("extra_kind"),
    )


def is_spot_sku(sku_name: Column) -> Column:
    """Azure retail-price classifier (_azure.py:611-632): '... Spot' SKUs
    are spot allocation; '... Low Priority' rows are dropped upstream."""
    return sku_name.endswith(" Spot")


def azure_residual_filters(df, meter_col: str = "meterName",
                           product_col: str = "productName",
                           price_col: str = "retailPrice"):
    """P5 — client-side residual filters (_azure.py:611-632): drop
    Low-Priority meters, Windows products, zero prices."""
    return df.filter(
        ~F.col(meter_col).contains("Low Priority")
        & ~F.col(product_col).endswith("Windows")
        & (F.col(price_col) > 0)
    )
