"""Static in-code dimension catalogs (SURVEY.md §2.1 S12).

Full port of the reference's static dimension data:

- countries/continents        (reference lookup.py:18-58)
- compliance frameworks       (reference lookup.py:69-91)
- vendor -> framework mapping (reference vendors/_*.py inventory_compliance_frameworks)
- vendor facts, 8 vendors     (reference vendors/vendors.py:10-156)
- AWS region facts            (reference vendors/_aws.py:489-903)
- benchmark catalog           (reference lookup.py:213-727; config_fields kept
  as the queryable field-name list, prose descriptions dropped)
- workload_profile:* compound benchmarks appended per WORKLOADS
  (reference lookup.py:730-766)

The reference ships these as Python ORM objects; here each catalog is a
literal tuple table compiled to a Spark LocalRelation via a generated
``VALUES`` clause (no Python-RDD round trip, broadcastable into joins),
and the SAME tuples render to DuckDB ``VALUES`` SQL so oracle queries
share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (country_id, continent) - lookup.py:18-58
COUNTRIES: list[tuple[str, str]] = [
    ('AE', 'Asia'), ('AT', 'Europe'), ('AU', 'Oceania'), ('BE', 'Europe'),
    ('BH', 'Asia'), ('BR', 'South America'), ('CA', 'North America'), ('CH', 'Europe'),
    ('CL', 'South America'), ('CN', 'Asia'), ('DE', 'Europe'), ('DK', 'Europe'),
    ('ES', 'Europe'), ('FI', 'Europe'), ('FR', 'Europe'), ('GB', 'Europe'),
    ('HK', 'Asia'), ('ID', 'Asia'), ('IE', 'Europe'), ('IL', 'Asia'),
    ('IT', 'Europe'), ('IN', 'Asia'), ('JP', 'Asia'), ('KR', 'Asia'),
    ('MY', 'Asia'), ('MX', 'North America'), ('NL', 'Europe'), ('NO', 'Europe'),
    ('NZ', 'Oceania'), ('PH', 'Asia'), ('PL', 'Europe'), ('QA', 'Asia'),
    ('SA', 'Asia'), ('SE', 'Europe'), ('SG', 'Asia'), ('TH', 'Asia'),
    ('TW', 'Asia'), ('US', 'North America'), ('ZA', 'Africa'),
]

# (framework_id, name, abbreviation, homepage) - lookup.py:69-91
COMPLIANCE_FRAMEWORKS: list[tuple[str, str, str, str]] = [
    ("hipaa", "The Health Insurance Portability and Accountability Act",
     "HIPAA", "https://www.cdc.gov/phlp/publications/topic/hipaa.html"),
    ("soc2t2", "System and Organization Controls Level 2 Type 2",
     "SOC 2 Type 2",
     "https://www.aicpa-cima.com/topic/audit-assurance/audit-and-assurance-greater-than-soc-2"),
    ("iso27001", "ISO/IEC 27001", "ISO 27001",
     "https://www.iso.org/standard/27001"),
]

# (vendor_id, framework_id) - vendors/_*.py inventory_compliance_frameworks
VENDOR_COMPLIANCE: list[tuple[str, str]] = [
    ("alicloud", "hipaa"), ("alicloud", "soc2t2"), ("alicloud", "iso27001"),
    ("aws", "hipaa"), ("aws", "soc2t2"), ("aws", "iso27001"),
    ("azure", "hipaa"), ("azure", "soc2t2"), ("azure", "iso27001"),
    ("gcp", "hipaa"), ("gcp", "soc2t2"), ("gcp", "iso27001"),
    ("hcloud", "iso27001"),
    ("ovh", "iso27001"), ("ovh", "soc2t2"),
    ("upcloud", "iso27001"),
    ("vultr", "hipaa"), ("vultr", "soc2t2"), ("vultr", "iso27001"),
]

# (vendor_id, name, homepage, country_id, state, city, address_line,
#  zip_code, founding_year, status_page, stopped_server_charged,
#  billing_increment_seconds, minimum_billing_seconds, billing_comment)
# - vendors/vendors.py:10-156
VENDORS: list[tuple] = [
    ("aws", "Amazon Web Services", "https://aws.amazon.com", "US",
     "Washington", "Seattle", "410 Terry Ave N", "98109", 2002,
     "https://health.aws.amazon.com/health/status", False, 1, 60, None),
    ("gcp", "Google Cloud Platform", "https://cloud.google.com", "US",
     "California", "Mountain View", "1600 Amphitheatre Pkwy", "94043", 2008,
     "https://status.cloud.google.com/", False, 1, 60, None),
    ("hcloud", "Hetzner Cloud", "https://www.hetzner.com/cloud/", "DE",
     "Bavaria", "Gunzenhausen", "Industriestr. 25", "91710", 2018,
     "https://status.hetzner.com/", True, 3600, 3600, None),
    ("azure", "Microsoft Azure", "https://azure.microsoft.com", "US",
     "Washington", "Redmond", "One Microsoft Way", "98052", 2010,
     "https://azure.status.microsoft.com", True, 1, 300,
     "Billing of stopped server depends on allocation status."),
    ("upcloud", "UpCloud", "https://upcloud.com", "FI",
     "Uusimaa", "Helsinki", "Aleksanterinkatu 15 B, 7th floor", "00100", 2012,
     "https://status.upcloud.com", True, 3600, 3600,
     "Billing of stopped servers depends on the instance family: Developer "
     "and General Purpose instances are billed, while Cloud Native instances "
     "are not."),
    ("alicloud", "Alibaba Cloud", "https://www.alibabacloud.com/", "CN",
     "Zhejiang", "Hangzhou", "969 West Wen Yi Road", "311121", 2009,
     "https://status.alibabacloud.com/", True, 1, 600,
     "Billing of stopped server depends on stop mode: Standard or "
     "Economical. Min billing 600, 300, or 120 seconds by vCPU."),
    ("ovh", "OVHcloud", "https://www.ovhcloud.com", "FR",
     "Hauts-de-France", "Roubaix", "2 rue Kellermann", "59100", 1999,
     "https://www.status-ovhcloud.com", False, 3600, 3600,
     "Billing for stopped servers depends on status: suspended or paused is "
     "billed, while shelved is not."),
    ("vultr", "Vultr", "https://www.vultr.com", "US",
     "Florida", "West Palm Beach", "319 Clematis St, Suite 900", "33401",
     2014, "https://status.vultr.com", True, 3600, 3600, None),
]

# (region_id, name, country_id, state, city, founding_year, lat, lon)
# - vendors/_aws.py:489-903 (manual launch-date/coordinate facts)
AWS_REGIONS: list[tuple] = [
    ('af-south-1', 'Africa (Cape Town)', 'ZA', None, 'Cape Town', 2020, -33.914651, 18.3758801),
    ('ap-east-1', 'Asia Pacific (Hong Kong)', 'HK', None, 'Hong Kong', 2019, 22.2908475, 114.2723379),
    ('ap-east-2', 'Asia Pacific (Taipei)', 'TW', None, 'Taipei', 2025, 25.037518, 121.563667),
    ('ap-northeast-1', 'Asia Pacific (Tokyo)', 'JP', None, 'Tokyo', 2011, 35.617436, 139.7459176),
    ('ap-northeast-2', 'Asia Pacific (Seoul)', 'KR', None, 'Seoul', 2016, 37.5616592, 126.8736237),
    ('ap-northeast-3', 'Asia Pacific (Osaka)', 'JP', None, 'Osaka', 2021, 34.693889, 135.502222),
    ('ap-south-1', 'Asia Pacific (Mumbai)', 'IN', None, 'Mumbai', 2016, 19.2425503, 72.9667878),
    ('ap-south-2', 'Asia Pacific (Hyderabad)', 'IN', None, 'Hyderabad', 2022, 17.412281, 78.243237),
    ('ap-southeast-1', 'Asia Pacific (Singapore)', 'SG', None, 'Singapore', 2010, 1.3218269, 103.6930643),
    ('ap-southeast-2', 'Asia Pacific (Sydney)', 'AU', None, 'Sydney', 2012, -33.9117717, 151.1907535),
    ('ap-southeast-3', 'Asia Pacific (Jakarta)', 'ID', None, 'Jakarta', 2021, -6.2, 106.816667),
    ('ap-southeast-4', 'Asia Pacific (Melbourne)', 'AU', None, 'Melbourne', 2023, -37.8038607, 144.7119569),
    ('ap-southeast-5', 'Asia Pacific (Malaysia)', 'MY', None, None, 2024, 4.1230237, 104.3228082),
    ('ap-southeast-6', 'Asia Pacific (New Zealand)', 'NZ', None, None, 2025, -40.900775, 174.802185),
    ('ap-southeast-7', 'Asia Pacific (Thailand)', 'TH', None, None, 2022, 15.870032, 100.992538),
    ('ca-central-1', 'Canada (Central)', 'CA', None, 'Quebec', 2016, 45.5, -73.6),
    ('ca-west-1', 'Canada West (Calgary)', 'CA', None, 'Calgary', 2023, 51.046574, -114.129024),
    ('cn-north-1', 'China (Beijing)', 'CN', None, 'Beijing', 2016, 39.8094478, 116.5783234),
    ('cn-northwest-1', 'China (Ningxia)', 'CN', None, 'Ningxia', 2017, 37.5024418, 105.1627193),
    ('eu-central-1', 'Europe (Frankfurt)', 'DE', None, 'Frankfurt', 2014, 50.0992094, 8.6303932),
    ('eu-central-2', 'Europe (Zurich)', 'CH', None, 'Zurich', 2022, 47.3862924, 8.4448814),
    ('eu-north-1', 'Europe (Stockholm)', 'SE', None, 'Stockholm', 2018, 59.326242, 17.8419717),
    ('eu-south-1', 'Europe (Milan)', 'IT', None, 'Milan', 2020, 45.4628328, 9.1076927),
    ('eu-south-2', 'Europe (Spain)', 'ES', None, 'Aragón', 2022, 41.7943702, -0.8516735),
    ('eu-west-1', 'Europe (Ireland)', 'IE', None, 'Dublin', 2007, 53.4056545, -6.224503),
    ('eu-west-2', 'Europe (London)', 'GB', None, 'London', 2016, 51.5085036, -0.0609266),
    ('eu-west-3', 'Europe (Paris)', 'FR', None, 'Paris', 2017, 48.6009709, 2.2976644),
    ('il-central-1', 'Israel (Tel Aviv)', 'IL', None, 'Tel Aviv', 2023, 32.0491183, 34.7891105),
    ('me-central-1', 'Middle East (UAE)', 'AE', None, None, 2022, 25.0647937, 55.1363688),
    ('me-south-1', 'Middle East (Bahrain)', 'BH', None, None, 2019, 25.941298, 50.3073907),
    ('mx-central-1', 'Mexico (Central)', 'MX', None, None, 2025, 20.5896, -100.3897),
    ('sa-east-1', 'South America (Sao Paulo)', 'BR', None, 'Sao Paulo', 2011, -23.4925798, -46.8105593),
    ('us-east-1', 'US East (N. Virginia)', 'US', 'Northern Virgina', None, 2006, 38.9940541, -77.4524237),
    ('us-east-2', 'US East (Ohio)', 'US', 'Ohio', None, 2016, 40.0946354, -82.7541337),
    ('us-west-1', 'US West (N. California)', 'US', 'California', None, 2009, 37.44368, -122.153664),
    ('us-west-2', 'US West (Oregon)', 'US', 'Oregon', None, 2011, 45.9174667, -119.2684488),
]

# (benchmark_id, name, category, framework, measurement, unit,
#  higher_is_better, config_fields) - lookup.py:213-727
BENCHMARKS: list[tuple] = [
    ('bogomips', 'BogoMips', 'Other', 'bogomips', None, 'Millions of instructions per second (MIPS)', True, []),
    ('bw_mem', 'Memory bandwidth (bw_mem)', 'Memory bandwidth', 'bw_mem', None, 'Megabytes per second (MB/sec)', True, ['operation', 'size']),
    ('compression_text:ratio', 'Compression ratio', 'Compression algos', 'compression_text', 'ratio', None, False, ['algo', 'compression_level', 'cores', 'block_size']),
    ('compression_text:compress', 'Compression bandwidth', 'Compression algos', 'compression_text', 'compress', 'Bytes per second (Bps)', True, ['algo', 'compression_level', 'cores', 'block_size']),
    ('compression_text:decompress', 'Decompression bandwidth', 'Compression algos', 'compression_text', 'decompress', 'Bytes per second (Bps)', True, ['algo', 'compression_level', 'cores', 'block_size']),
    ('geekbench:score', 'Geekbench: Score', 'Geekbench', 'geekbench', 'score', None, True, ['cores']),
    ('geekbench:file_compression', 'Geekbench: File Compression', 'Geekbench', 'geekbench', 'file_compression', None, True, ['cores']),
    ('geekbench:navigation', 'Geekbench: Navigation', 'Geekbench', 'geekbench', 'navigation', None, True, ['cores']),
    ('geekbench:html5_browser', 'Geekbench: HTML5 Browser', 'Geekbench', 'geekbench', 'html5_browser', None, True, ['cores']),
    ('geekbench:pdf_renderer', 'Geekbench: PDF Renderer', 'Geekbench', 'geekbench', 'pdf_renderer', None, True, ['cores']),
    ('geekbench:photo_library', 'Geekbench: Photo Library', 'Geekbench', 'geekbench', 'photo_library', None, True, ['cores']),
    ('geekbench:clang', 'Geekbench: Clang', 'Geekbench', 'geekbench', 'clang', None, True, ['cores']),
    ('geekbench:text_processing', 'Geekbench: Text Processing', 'Geekbench', 'geekbench', 'text_processing', None, True, ['cores']),
    ('geekbench:asset_compression', 'Geekbench: Asset Compression', 'Geekbench', 'geekbench', 'asset_compression', None, True, ['cores']),
    ('geekbench:object_detection', 'Geekbench: Object Detection', 'Geekbench', 'geekbench', 'object_detection', None, True, ['cores']),
    ('geekbench:background_blur', 'Geekbench: Background Blur', 'Geekbench', 'geekbench', 'background_blur', None, True, ['cores']),
    ('geekbench:horizon_detection', 'Geekbench: Horizon Detection', 'Geekbench', 'geekbench', 'horizon_detection', None, True, ['cores']),
    ('geekbench:object_remover', 'Geekbench: Object Remover', 'Geekbench', 'geekbench', 'object_remover', None, True, ['cores']),
    ('geekbench:hdr', 'Geekbench: HDR', 'Geekbench', 'geekbench', 'hdr', None, True, ['cores']),
    ('geekbench:photo_filter', 'Geekbench: Photo Filter', 'Geekbench', 'geekbench', 'photo_filter', None, True, ['cores']),
    ('geekbench:ray_tracer', 'Geekbench: Ray Tracer', 'Geekbench', 'geekbench', 'ray_tracer', None, True, ['cores']),
    ('geekbench:structure_from_motion', 'Geekbench: Structure from Motion', 'Geekbench', 'geekbench', 'structure_from_motion', None, True, ['cores']),
    ('openssl', 'OpenSSL speed', 'OpenSSL', 'openssl', None, 'Bytes per second (Bps)', True, ['algo', 'block_size']),
    ('stress_ng:cpu_all', 'stress-ng CPU all', 'stress-ng', 'stress_ng', 'cpu_all', 'Bogo operations per second (ops/s)', True, ['cores']),
    ('stress_ng:div16', 'stress-ng div16', 'stress-ng', 'stress_ng', 'div16', 'Bogo operations per second (ops/s)', True, ['cores']),
    ('stress_ng:best1', 'stress-ng div16 single-core', 'stress-ng', 'stress_ng', 'best1', 'Bogo operations per second (ops/s)', True, []),
    ('stress_ng:bestn', 'stress-ng div16 multi-core', 'stress-ng', 'stress_ng', 'bestn', 'Bogo operations per second (ops/s)', True, []),
    ('static_web:rps', 'Static web server+client speed', 'Static web server', 'static_web', 'rps', 'Requests per second (rps)', True, ['size', 'connections_per_vcpus']),
    ('static_web:rps-extrapolated', 'Static web server (extrapolated) speed', 'Static web server', 'static_web', 'rps-extrapolated', 'Requests per second (rps)', True, ['size', 'connections_per_vcpus']),
    ('static_web:throughput', 'Static web server+client throughput', 'Static web server', 'static_web', 'throughput', 'Bytes per second (Bps)', True, ['size', 'connections_per_vcpus']),
    ('static_web:throughput-extrapolated', 'Static web server (extrapolated) throughput', 'Static web server', 'static_web', 'throughput-extrapolated', 'Bytes per second (Bps)', True, ['size', 'connections_per_vcpus']),
    ('static_web:latency', 'Static web server latency', 'Static web server', 'static_web', 'latency', 'Seconds (sec)', False, ['size', 'connections_per_vcpus']),
    ('redis:rps', 'Redis server+client speed', 'Redis', 'redis', 'rps', 'Operations per second (ops/sec)', True, ['operation', 'pipeline']),
    ('redis:rps-extrapolated', 'Redis server (extrapolated) speed', 'Redis', 'redis', 'rps-extrapolated', 'Operations per second (ops/sec)', True, ['operation', 'pipeline']),
    ('redis:latency', 'Redis latency', 'Redis', 'redis', 'latency', 'Milliseconds (ms)', False, ['operation', 'pipeline']),
    ('passmark:cpu_mark', 'PassMark: CPU Mark', 'Passmark', 'passmark', 'cpu_mark', None, True, []),
    ('passmark:cpu_integer_maths_test', 'PassMark: CPU Integer Maths Test', 'Passmark', 'passmark', 'cpu_integer_maths_test', 'Millions of operations per second (Mops/s)', True, []),
    ('passmark:cpu_floating_point_maths_test', 'PassMark: CPU Floating Point Maths Test', 'Passmark', 'passmark', 'cpu_floating_point_maths_test', 'Millions of operations per second (Mops/s)', True, []),
    ('passmark:cpu_prime_numbers_test', 'PassMark: CPU Prime Numbers Test', 'Passmark', 'passmark', 'cpu_prime_numbers_test', 'Million prime numbers per second (Mnums/s)', True, []),
    ('passmark:cpu_string_sorting_test', 'PassMark: CPU String Sorting Test', 'Passmark', 'passmark', 'cpu_string_sorting_test', 'Thousands of strings per second (Kstrings/s)', True, []),
    ('passmark:cpu_encryption_test', 'PassMark: CPU Encryption Test', 'Passmark', 'passmark', 'cpu_encryption_test', 'Megabytes per second (MB/s)', True, []),
    ('passmark:cpu_compression_test', 'PassMark: CPU Compression Test', 'Passmark', 'passmark', 'cpu_compression_test', 'Kilobytes per second (kB/s)', True, []),
    ('passmark:cpu_single_threaded_test', 'PassMark: CPU Single Threaded Test', 'Passmark', 'passmark', 'cpu_single_threaded_test', 'Millions of operations per second (Mops/s)', True, []),
    ('passmark:cpu_physics_test', 'PassMark: CPU Physics Test', 'Passmark', 'passmark', 'cpu_physics_test', 'Frames per second (fps)', True, []),
    ('passmark:cpu_extended_instructions_test', 'PassMark: CPU Extended Instructions Test', 'Passmark', 'passmark', 'cpu_extended_instructions_test', 'Millions of matrices per second (Mmat/s)', True, []),
    ('passmark:memory_mark', 'PassMark: Memory Mark', 'Passmark', 'passmark', 'memory_mark', None, True, []),
    ('passmark:database_operations', 'PassMark: Database Operations', 'Passmark', 'passmark', 'database_operations', 'Thousands of operations per second (Kops/s)', True, []),
    ('passmark:memory_read_cached', 'PassMark: Memory Read Cached', 'Passmark', 'passmark', 'memory_read_cached', 'Megabytes per second (MB/s)', True, []),
    ('passmark:memory_read_uncached', 'PassMark: Memory Read Uncached', 'Passmark', 'passmark', 'memory_read_uncached', 'Megabytes per second (MB/s)', True, []),
    ('passmark:memory_write', 'PassMark: Memory Write', 'Passmark', 'passmark', 'memory_write', 'Megabytes per second (MB/s)', True, []),
    ('passmark:memory_latency', 'PassMark: Memory Latency', 'Passmark', 'passmark', 'memory_latency', 'Nanoseconds (ns)', False, []),
    ('membench:bandwidth_read', 'Memory read bandwidth (sc-membench)', 'Memory bandwidth', 'membench', 'memory_bandwidth', 'MB/s', True, ['size_kb', 'scope']),
    ('membench:bandwidth_write', 'Memory write bandwidth (sc-membench)', 'Memory bandwidth', 'membench', 'memory_bandwidth', 'MB/s', True, ['size_kb', 'scope']),
    ('membench:bandwidth_copy', 'Memory copy bandwidth (sc-membench)', 'Memory bandwidth', 'membench', 'memory_bandwidth', 'MB/s', True, ['size_kb', 'scope']),
    ('membench:latency', 'Memory latency (sc-membench)', 'Memory latency', 'membench', 'memory_latency', 'ns', False, ['size_kb', 'scope']),
    ('llm_speed:text_generation', 'LLM inference speed for text generation', 'LLM inference speed', 'llm_speed', 'text_generation', 'tokens/second (t/s)', True, ['model', 'tokens']),
    ('llm_speed:prompt_processing', 'LLM inference speed for prompt processing', 'LLM inference speed', 'llm_speed', 'prompt_processing', 'tokens/second (t/s)', True, ['model', 'tokens']),
]


def _lit(v) -> str:
    """Render one Python value as a SQL literal shared by Spark and DuckDB."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(rows: list[tuple], cols: list[str], casts: dict[str, str] | None = None) -> str:
    """``(VALUES ...) AS t(col, ...)`` clause from literal rows — one
    source of truth for the Spark LocalRelation AND the DuckDB oracle."""
    casts = casts or {}
    vals = ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows
    )
    sel = ", ".join(
        f"CAST({c} AS {casts[c]}) AS {c}" if c in casts else c for c in cols
    )
    return f"(SELECT {sel} FROM (VALUES {vals}) AS _v({', '.join(cols)}))"


def _frame(spark: SparkSession, rows: list[tuple], cols: list[str],
           casts: dict[str, str] | None = None) -> DataFrame:
    # literal VALUES -> LocalRelation (no Python-RDD round trip; the plan
    # is broadcast-ready and constant-folded by Catalyst)
    return spark.sql(f"SELECT * FROM {values_sql(rows, cols, casts)} t")


COUNTRY_COLS = ["country_id", "continent"]
COMPLIANCE_COLS = ["compliance_framework_id", "name", "abbreviation", "homepage"]
VENDOR_COMPLIANCE_COLS = ["vendor_id", "compliance_framework_id"]
VENDOR_COLS = [
    "vendor_id", "name", "homepage", "country_id", "state", "city",
    "address_line", "zip_code", "founding_year", "status_page",
    "stopped_server_charged", "billing_increment_seconds",
    "minimum_billing_seconds", "billing_comment",
]
REGION_COLS = [
    "region_id", "name", "country_id", "state", "city", "founding_year",
    "lat", "lon",
]
BENCHMARK_COLS = [
    "benchmark_id", "name", "category", "framework", "measurement", "unit",
    "higher_is_better", "config_fields",
]


def _benchmark_rows() -> list[tuple]:
    """Static catalog + one workload_profile:<name> compound benchmark per
    WORKLOADS entry (lookup.py:730-766). ``config_fields`` is flattened to
    a comma-joined field-name string (portable literal in both engines)."""
    from ..workloads import WORKLOADS

    rows = [(*r[:7], ",".join(r[7]) or None) for r in BENCHMARKS]
    for wname, w in WORKLOADS.items():
        rows.append((
            f"workload_profile:{wname}", f"Workload profile: {w['name']}",
            "Workload profile", "workload_profile", "score", None, True, None,
        ))
    return rows


def countries(spark: SparkSession) -> DataFrame:
    return _frame(spark, COUNTRIES, COUNTRY_COLS)


def compliance_frameworks(spark: SparkSession) -> DataFrame:
    return _frame(spark, COMPLIANCE_FRAMEWORKS, COMPLIANCE_COLS)


def vendor_compliance(spark: SparkSession) -> DataFrame:
    return _frame(spark, VENDOR_COMPLIANCE, VENDOR_COMPLIANCE_COLS)


def vendors(spark: SparkSession) -> DataFrame:
    return _frame(spark, VENDORS, VENDOR_COLS)


def aws_regions(spark: SparkSession) -> DataFrame:
    return _frame(spark, AWS_REGIONS, REGION_COLS)


def benchmarks(spark: SparkSession) -> DataFrame:
    return _frame(spark, _benchmark_rows(), BENCHMARK_COLS)
