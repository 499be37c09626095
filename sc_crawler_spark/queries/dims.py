"""Static-dimension queries (SURVEY.md §2.1 S12).

Exercise the full in-code dimension catalogs (sources/lookup.py — the
port of reference lookup.py:18-767, vendors/vendors.py:10-156,
_aws.py:489-903) through fact→region→country joins and dim-only
rollups. The Spark side builds each dim as a LocalRelation broadcast
into the join; the oracle side renders the SAME tuples via
``lookup.values_sql`` so both engines query one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import decimal_sum, dround, sql_round
from ..sources import lookup
from ..tables import load

N_REGIONS = len(lookup.AWS_REGIONS)


def _regions_indexed(spark: SparkSession) -> DataFrame:
    """AWS region dim with a dense 0-based index in region_id order —
    the synthetic fact→region assignment key (suppkey mod N_REGIONS).
    The window runs on a 36-row LocalRelation: no shuffle of real data."""
    w = Window.orderBy("region_id")
    return lookup.aws_regions(spark).withColumn(
        "region_idx", F.row_number().over(w) - 1
    )


def region_dims_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """supplier → region → country → continent rollup.

    The fact table is assigned a region by ``s_suppkey % 36`` (a stand-in
    for the real servers.region_id foreign key — the lake fixtures carry
    no region column), then both dims broadcast in and the rollup is one
    shuffle on the 6-value continent key. At 100 TB: two broadcast hash
    joins + one partial-aggregated groupBy — no fact-side sort anywhere.
    """
    supp = load(spark, sf, "supplier")
    regions = _regions_indexed(spark)
    countries = lookup.countries(spark)
    return (
        supp.withColumn("region_idx", F.pmod(F.col("s_suppkey"), F.lit(N_REGIONS)))
        .join(F.broadcast(regions), "region_idx")
        .join(F.broadcast(countries), "country_id")
        .groupBy("continent")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.countDistinct("region_id").alias("n_regions"),
            F.min("founding_year").alias("first_region_year"),
            dround(decimal_sum(F.col("s_acctbal")), 2).alias("total_acctbal"),
        )
        .orderBy("continent")
    )


def region_dims_rollup_sql() -> str:
    regions = lookup.values_sql(lookup.AWS_REGIONS, lookup.REGION_COLS)
    countries = lookup.values_sql(lookup.COUNTRIES, lookup.COUNTRY_COLS)
    return f"""
WITH r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY region_id) - 1 AS region_idx
  FROM {regions} t
)
SELECT c.continent,
       COUNT(*) AS n_suppliers,
       COUNT(DISTINCT r.region_id) AS n_regions,
       MIN(r.founding_year) AS first_region_year,
       {sql_round('SUM(CAST(s.s_acctbal AS DECIMAL(28,6)))', 2)} AS total_acctbal
FROM supplier s
JOIN r ON s.s_suppkey % {N_REGIONS} = r.region_idx
JOIN {countries} c ON r.country_id = c.country_id
GROUP BY c.continent
ORDER BY c.continent
"""


def vendor_compliance_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """3-way dim join: vendor → HQ country → compliance frameworks, one
    row per vendor with its continent, framework count and the
    alphabetically collected framework abbreviations (A14-style ordered
    distinct collect). Dims only — proves the vendor/compliance/country
    catalogs carry the reference's full content."""
    vendors = lookup.vendors(spark).select(
        "vendor_id", "name", "country_id", "founding_year",
        "minimum_billing_seconds")
    countries = lookup.countries(spark)
    vc = lookup.vendor_compliance(spark)
    frameworks = lookup.compliance_frameworks(spark).select(
        "compliance_framework_id", "abbreviation")
    return (
        vendors
        .join(F.broadcast(countries), "country_id")
        .join(vc, "vendor_id")
        .join(F.broadcast(frameworks), "compliance_framework_id")
        .groupBy("vendor_id", "name", "continent", "founding_year",
                 "minimum_billing_seconds")
        .agg(
            F.count("*").alias("n_frameworks"),
            F.concat_ws(",", F.array_sort(F.collect_set("abbreviation")))
            .alias("frameworks"),
        )
        .orderBy("vendor_id")
    )


def vendor_compliance_matrix_sql() -> str:
    vendors = lookup.values_sql(lookup.VENDORS, lookup.VENDOR_COLS)
    countries = lookup.values_sql(lookup.COUNTRIES, lookup.COUNTRY_COLS)
    vc = lookup.values_sql(lookup.VENDOR_COMPLIANCE, lookup.VENDOR_COMPLIANCE_COLS)
    fw = lookup.values_sql(lookup.COMPLIANCE_FRAMEWORKS, lookup.COMPLIANCE_COLS)
    return f"""
SELECT v.vendor_id, v.name, c.continent, v.founding_year,
       v.minimum_billing_seconds,
       COUNT(*) AS n_frameworks,
       string_agg(f.abbreviation, ',' ORDER BY f.abbreviation) AS frameworks
FROM {vendors} v
JOIN {countries} c ON v.country_id = c.country_id
JOIN {vc} m ON v.vendor_id = m.vendor_id
JOIN {fw} f ON m.compliance_framework_id = f.compliance_framework_id
GROUP BY v.vendor_id, v.name, c.continent, v.founding_year,
         v.minimum_billing_seconds
ORDER BY v.vendor_id
"""


def benchmark_catalog_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-catalog rollup per category: row counts, orientation
    split, and config-field fan-out — proves the full 63-row catalog
    (57 static + 6 workload_profile compounds) is carried with
    higher_is_better and config_fields intact."""
    b = lookup.benchmarks(spark)
    n_cfg = F.when(
        F.col("config_fields").isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.col("config_fields"), ",")))
    return (
        b.withColumn("n_cfg", n_cfg)
        .groupBy("category")
        .agg(
            F.count("*").alias("n_benchmarks"),
            F.sum(F.when(F.col("higher_is_better"), 0).otherwise(1))
            .cast("bigint").alias("n_lower_is_better"),
            F.sum("n_cfg").cast("bigint").alias("total_config_fields"),
            F.count_distinct("framework").alias("n_frameworks"),
        )
        .orderBy("category")
    )


def benchmark_catalog_stats_sql() -> str:
    rows = lookup.values_sql(lookup._benchmark_rows(), lookup.BENCHMARK_COLS)
    return f"""
SELECT category,
       COUNT(*) AS n_benchmarks,
       CAST(SUM(CASE WHEN higher_is_better THEN 0 ELSE 1 END) AS BIGINT)
           AS n_lower_is_better,
       CAST(SUM(CASE WHEN config_fields IS NULL THEN 0
                ELSE len(string_split(config_fields, ',')) END) AS BIGINT)
           AS total_config_fields,
       COUNT(DISTINCT framework) AS n_frameworks
FROM {rows} b
GROUP BY category
ORDER BY category
"""


QUERIES: dict[str, tuple] = {
    "region_dims_rollup": (region_dims_rollup, region_dims_rollup_sql()),
    "vendor_compliance_matrix": (
        vendor_compliance_matrix, vendor_compliance_matrix_sql()),
    "benchmark_catalog_stats": (
        benchmark_catalog_stats, benchmark_catalog_stats_sql()),
}
