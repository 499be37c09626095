"""S12 static dimension catalog tests: row counts match the reference
(lookup.py:18-58 countries, lookup.py:213-727 + WORKLOADS benchmarks,
vendors/vendors.py:10-156, _aws.py:489-903 regions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sc_crawler_spark.sources import lookup


def test_catalog_row_counts_match_reference():
    assert len(lookup.COUNTRIES) == 39
    assert len(lookup.COMPLIANCE_FRAMEWORKS) == 3
    assert len(lookup.VENDOR_COMPLIANCE) == 19
    assert len(lookup.VENDORS) == 8
    assert len(lookup.AWS_REGIONS) == 36
    assert len(lookup.BENCHMARKS) == 57
    assert len(lookup._benchmark_rows()) == 63  # + 6 workload_profile rows


def test_catalog_content_spotchecks(spark):
    regions = {r["region_id"]: r for r in lookup.aws_regions(spark).collect()}
    # _aws.py:489+: first region launched 2006 in us-east-1
    assert regions["us-east-1"]["founding_year"] == 2006
    assert regions["eu-west-1"]["country_id"] == "IE"
    assert abs(regions["af-south-1"]["lat"] - (-33.914651)) < 1e-9

    vendors = {r["vendor_id"]: r for r in lookup.vendors(spark).collect()}
    assert vendors["aws"]["founding_year"] == 2002
    assert vendors["hcloud"]["minimum_billing_seconds"] == 3600
    assert vendors["azure"]["stopped_server_charged"] is True

    b = {r["benchmark_id"]: r for r in lookup.benchmarks(spark).collect()}
    # lower-is-better rows exist (compression ratio, latencies)
    assert b["compression_text:ratio"]["higher_is_better"] is False
    assert b["redis:latency"]["higher_is_better"] is False
    assert b["membench:latency"]["higher_is_better"] is False
    assert "algo" in b["openssl"]["config_fields"]
    assert b["workload_profile:web"]["framework"] == "workload_profile"


def test_all_region_countries_resolve(spark):
    r = lookup.aws_regions(spark)
    c = lookup.countries(spark)
    unresolved = r.join(c, "country_id", "left_anti").count()
    assert unresolved == 0
    # every vendor HQ country resolves too
    v = lookup.vendors(spark)
    assert v.join(c, "country_id", "left_anti").count() == 0
