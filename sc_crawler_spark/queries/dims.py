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


# ------------------- long-tail vendor server_price assembly (r5, S4/P1)
#
# One literal fixture per vendor covering every branch of the price
# assemblies in sources/catalog.py (vultr location_cost overrides +
# monthly-cap tiers, upcloud SPOT split + GPU gate, ovh addon join +
# microcents, alicloud alias probe + WithStock gate). The Spark side
# runs the REAL operators over raw payload frames built from these
# constants; the oracle recomputes the same semantics from VALUES.

_VULTR_PLANS = [
    # (id, deploy_od, deploy_spot, h, m, hp, mp)
    ("vc2-1c-1gb", True, True, 0.018, 12.0, 0.01, 5.0),
    ("vbm-8c-132gb", True, False, 0.5, 300.0, None, None),
    ("vc2-free", True, False, 0.0, 0.0, None, None),
]
_VULTR_LOCATIONS = [("vc2-1c-1gb", "ewr"), ("vc2-1c-1gb", "ams"),
                    ("vbm-8c-132gb", "ewr"), ("vc2-free", "ewr")]
# (plan, region, h, m, hp, mp) — ams override lacks preemptible rates
_VULTR_OVERRIDES = [("vc2-1c-1gb", "ams", 0.02, 14.0, None, None)]

_UPCLOUD_ZONE_PRICES = [
    ("de-fra1", "2xCPU-4GB", 3.0), ("de-fra1", "SPOT-2xCPU-4GB", 1.2),
    ("de-fra1", "GPU-8xCPU-64GB", 200.0),
    ("fi-hel1", "2xCPU-4GB", 3.2), ("fi-hel1", "GPU-8xCPU-64GB", 200.0),
]
_UPCLOUD_GPU_AVAIL = [("de-fra1", "GPU-8xCPU-64GB", 2)]

_OVH_ADDONS = [("b2-7.consumption", "b2-7", "linux", 1170000000),
               ("c2-15.consumption", "c2-15", "linux", 3240000000)]
_OVH_FLAVORS = [("GRA7", "linux", "b2-7.consumption"),
                ("GRA7", "windows", "b2-7.consumption"),   # os gate
                ("XDC1", "linux", "b2-7.consumption"),     # unknown region
                ("GRA7", "linux", "c2-15.consumption")]
_OVH_REGIONS = [("gra", "GRA7")]
_OVH_ZONES = [("gra", "gra-a"), ("gra", "gra-b")]

_ALI_SKUS = [("cn-hangzhou", "ecs.g6.large", "linux", "0.123", "USD"),
             ("hz", "ecs.c6.large", "linux", "0.2", "USD"),  # alias probe
             ("cn-nowhere", "ecs.g6.large", "linux", "9.0", "USD")]
_ALI_REGIONS = [("cn-hangzhou", "cn-hangzhou", ["hz"])]
_ALI_ZONES = [("cn-hangzhou", ["cn-hangzhou-h", "cn-hangzhou-i"])]
_ALI_AVAIL = [("cn-hangzhou", "cn-hangzhou-h", "ecs.g6.large", "WithStock"),
              ("cn-hangzhou", "cn-hangzhou-h", "ecs.c6.large", "WithStock")]


def longtail_price_assembly(spark: SparkSession, sf: str) -> DataFrame:
    """Union of the four long-tail vendors' assembled ``server_price``
    rows (reference _vultr.py:546-627, _upcloud.py:446-521,
    _ovh.py:751-800, _alicloud.py:1030-1124), flattened to oracle-
    hashable columns: tier structure is exposed as ``n_tiers`` +
    ``tier1_upper`` (the monthly-cap proxy), status defaults active."""
    from ..sources import catalog as cat

    ov = {(p, r): (h, m, hp, mp) for p, r, h, m, hp, mp in _VULTR_OVERRIDES}
    vultr_raw = spark.createDataFrame(
        [
            {
                "id": pid,
                "locations": [r for p, r in _VULTR_LOCATIONS if p == pid],
                "deploy_ondemand": od, "deploy_preemptible": sp,
                "hourly_cost": h, "monthly_cost": m,
                "hourly_cost_preemptible": hp,
                "monthly_cost_preemptible": mp,
                "location_cost": {
                    r: {"hourly_cost": oh, "monthly_cost": om,
                        "hourly_cost_preemptible": ohp,
                        "monthly_cost_preemptible": omp}
                    for (p, r), (oh, om, ohp, omp) in ov.items() if p == pid
                } or None,
            }
            for pid, od, sp, h, m, hp, mp in _VULTR_PLANS
        ],
        cat.RAW_VULTR_PRICE,
    )
    vultr = cat.vultr_server_prices(vultr_raw, "ondemand").unionByName(
        cat.vultr_server_prices(vultr_raw, "spot"))

    up_zp = spark.createDataFrame(
        _UPCLOUD_ZONE_PRICES, "region_id string, plan_key string, raw_price double")
    up_ga = spark.createDataFrame(
        _UPCLOUD_GPU_AVAIL, "region_id string, plan string, amount int")
    upcloud = cat.upcloud_server_prices(up_zp, up_ga, "ondemand").unionByName(
        cat.upcloud_server_prices(up_zp, up_ga, "spot"))

    ovh_addons = spark.createDataFrame(
        [(p, i, {"technical": {"os": {"family": o}}}, [{"price": pr}])
         for p, i, o, pr in _OVH_ADDONS],
        "planCode string, invoiceName string, "
        "blobs struct<technical:struct<os:struct<family:string>>>, "
        "pricings array<struct<price:long>>",
    )
    ovh_flavors = spark.createDataFrame(
        [(r, o, {"hourly": p}) for r, o, p in _OVH_FLAVORS], cat.RAW_OVH_FLAVOR)
    ovh_regions = spark.createDataFrame(
        _OVH_REGIONS, "region_id string, api_reference string")
    ovh_zones = spark.createDataFrame(
        [(r, [z for rr, z in _OVH_ZONES if rr == r])
         for r in {r for r, _ in _OVH_ZONES}],
        "region_id string, zones array<string>")
    ovh = cat.ovh_server_prices(
        ovh_addons, ovh_flavors, ovh_regions, ovh_zones, currency="EUR")

    ali_skus = spark.createDataFrame(
        [({"vm_region_no": r, "instance_type": s, "vm_os_kind": o},
          [{"Price": p, "Currency": c}])
         for r, s, o, p, c in _ALI_SKUS], cat.RAW_ALICLOUD_SKU)
    ali_regions = spark.createDataFrame(
        [(r, a, al) for r, a, al in _ALI_REGIONS],
        "region_id string, api_reference string, aliases array<string>")
    ali_zones = spark.createDataFrame(
        _ALI_ZONES, "region_id string, zones array<string>")
    ali_avail = spark.createDataFrame(_ALI_AVAIL, cat.RAW_ALICLOUD_AVAIL)
    ali = cat.alicloud_server_prices(ali_skus, ali_avail, ali_regions, ali_zones)

    out = vultr.unionByName(upcloud).unionByName(
        ovh, allowMissingColumns=True).unionByName(
        ali, allowMissingColumns=True)
    return out.select(
        "vendor_id", "region_id", "zone_id", "server_id", "allocation",
        dround(F.col("price"), 4).alias("price"),
        "currency",
        # double, not int: the nullable column must land as the same
        # pandas dtype kind from both engines in the driver compare;
        # size() is guarded because legacy sizeOfNull yields -1
        F.when(F.col("price_tiered").isNotNull(), F.size("price_tiered"))
        .cast("double").alias("n_tiers"),
        F.try_element_at("price_tiered", F.lit(1))["upper"]
        .alias("tier1_upper"),
        F.coalesce(F.col("status"), F.lit("active")).alias("status"),
    )


def _vals(rows, quote_all=False) -> str:
    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)
    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


def longtail_price_assembly_sql() -> str:
    # zone/alias dims pre-exploded for SQL
    ali_probe = [(r, k) for r, a, al in _ALI_REGIONS for k in [a, *al]]
    ali_zones = [(r, z) for r, zs in _ALI_ZONES for z in zs]
    cap = "CAST(CAST(floor(monthly / hourly) AS DOUBLE) AS VARCHAR)"
    return f"""
WITH v_plans(id, deploy_od, deploy_spot, h, m, hp, mp) AS (VALUES {_vals(_VULTR_PLANS)}),
v_loc(plan, region) AS (VALUES {_vals(_VULTR_LOCATIONS)}),
v_ov(plan, region, h, m, hp, mp) AS (VALUES {_vals(_VULTR_OVERRIDES)}),
vultr_raw AS (
  SELECT 'vultr' AS vendor_id, l.region AS region_id, l.region AS zone_id,
         p.id AS server_id, a.allocation,
         CASE WHEN o.plan IS NOT NULL
              THEN CASE a.allocation WHEN 'ondemand' THEN o.h ELSE o.hp END
              ELSE CASE a.allocation WHEN 'ondemand' THEN p.h ELSE p.hp END
         END AS hourly,
         CASE WHEN o.plan IS NOT NULL
              THEN CASE a.allocation WHEN 'ondemand' THEN o.m ELSE o.mp END
              ELSE CASE a.allocation WHEN 'ondemand' THEN p.m ELSE p.mp END
         END AS monthly,
         'USD' AS currency, 'active' AS status
  FROM v_plans p
  JOIN v_loc l ON l.plan = p.id
  CROSS JOIN (VALUES ('ondemand'), ('spot')) a(allocation)
  LEFT JOIN v_ov o ON o.plan = p.id AND o.region = l.region
  WHERE (a.allocation = 'ondemand' AND p.deploy_od)
     OR (a.allocation = 'spot' AND p.deploy_spot)),
vultr AS (
  SELECT vendor_id, region_id, zone_id, server_id, allocation,
         hourly AS price, currency,
         CASE WHEN hourly = 0 THEN 0
              WHEN hourly IS NOT NULL AND monthly IS NOT NULL THEN 2 END AS n_tiers,
         CASE WHEN hourly = 0 OR hourly IS NULL OR monthly IS NULL THEN NULL
              ELSE {cap} END AS tier1_upper,
         status
  FROM vultr_raw),
u_zp(region_id, plan_key, raw_price) AS (VALUES {_vals(_UPCLOUD_ZONE_PRICES)}),
u_ga(region_id, plan, amount) AS (VALUES {_vals(_UPCLOUD_GPU_AVAIL)}),
upcloud AS (
  SELECT 'upcloud' AS vendor_id, z.region_id, z.region_id AS zone_id,
         replace(z.plan_key, 'SPOT-', '') AS server_id,
         CASE WHEN position('SPOT' IN z.plan_key) > 0
              THEN 'spot' ELSE 'ondemand' END AS allocation,
         z.raw_price / 100 AS price, 'EUR' AS currency,
         CASE WHEN position('SPOT' IN z.plan_key) > 0 THEN 0 ELSE 2 END AS n_tiers,
         CASE WHEN position('SPOT' IN z.plan_key) > 0 THEN NULL
              ELSE '672.0' END AS tier1_upper,
         'active' AS status
  FROM u_zp z
  LEFT JOIN u_ga g ON g.region_id = z.region_id AND g.plan = z.plan_key
  WHERE z.plan_key NOT LIKE 'GPU%' OR COALESCE(g.amount, 0) > 0),
o_addons(plan, invoice, os, microcents) AS (VALUES {_vals(_OVH_ADDONS)}),
o_flavors(region_api, os_type, plan) AS (VALUES {_vals(_OVH_FLAVORS)}),
o_regions(region_id, api_reference) AS (VALUES {_vals(_OVH_REGIONS)}),
o_zones(region_id, zone_id) AS (VALUES {_vals(_OVH_ZONES)}),
ovh AS (
  SELECT 'ovh' AS vendor_id, r.region_id, z.zone_id, a.invoice AS server_id,
         'ondemand' AS allocation, a.microcents / 100000000 AS price,
         'EUR' AS currency, 0 AS n_tiers, NULL AS tier1_upper,
         'active' AS status
  FROM o_flavors f
  JOIN o_addons a ON a.plan = f.plan
  JOIN o_regions r ON r.api_reference = f.region_api
  JOIN o_zones z ON z.region_id = r.region_id
  WHERE f.os_type = 'linux'),
a_skus(vm_region_no, server_id, os, price, currency) AS (VALUES {_vals(_ALI_SKUS)}),
a_probe(region_id, vm_region_no) AS (VALUES {_vals(ali_probe)}),
a_zones(region_id, zone_id) AS (VALUES {_vals(ali_zones)}),
a_avail(region_id, zone_id, server_id, status_category) AS (VALUES {_vals(_ALI_AVAIL)}),
alicloud AS (
  SELECT 'alicloud' AS vendor_id, p.region_id, z.zone_id, s.server_id,
         'ondemand' AS allocation, CAST(s.price AS DOUBLE) AS price,
         s.currency, 0 AS n_tiers, NULL AS tier1_upper,
         CASE WHEN av.server_id IS NOT NULL THEN 'active'
              ELSE 'inactive' END AS status
  FROM a_skus s
  JOIN a_probe p ON p.vm_region_no = s.vm_region_no
  JOIN a_zones z ON z.region_id = p.region_id
  LEFT JOIN (SELECT DISTINCT region_id, zone_id, server_id FROM a_avail
             WHERE status_category = 'WithStock') av
    ON av.region_id = p.region_id AND av.zone_id = z.zone_id
   AND av.server_id = s.server_id),
unioned AS (
  SELECT * FROM vultr UNION ALL SELECT * FROM upcloud
  UNION ALL SELECT * FROM ovh UNION ALL SELECT * FROM alicloud)
SELECT vendor_id, region_id, zone_id, server_id, allocation,
       {sql_round('price', 4)} AS price, currency,
       CAST(n_tiers AS DOUBLE) AS n_tiers,
       CAST(tier1_upper AS VARCHAR) AS tier1_upper, status
FROM unioned
"""


QUERIES: dict[str, tuple] = {
    "longtail_price_assembly": (
        longtail_price_assembly, longtail_price_assembly_sql()),
    "region_dims_rollup": (region_dims_rollup, region_dims_rollup_sql()),
    "vendor_compliance_matrix": (
        vendor_compliance_matrix, vendor_compliance_matrix_sql()),
    "benchmark_catalog_stats": (
        benchmark_catalog_stats, benchmark_catalog_stats_sql()),
}
