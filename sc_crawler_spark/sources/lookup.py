"""Static in-code dimension data (SURVEY.md §2.1 S12; lookup.py:18-767,
vendors/vendors.py). The reference ships these as Python objects; here
they are literal DataFrames seeded once per session and broadcast into
joins.

Subset of rows sufficient for the synthetic fixtures; extend as vendors
are added — the point is the mechanism (literal DF -> MERGE into silver,
cli.py:849-866), not an exhaustive copy of the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNTRIES: list[tuple[str, str]] = [
    ("AE", "Asia"), ("AU", "Oceania"), ("AT", "Europe"), ("BE", "Europe"),
    ("BH", "Asia"), ("BR", "South America"), ("CA", "North America"),
    ("CH", "Europe"), ("CL", "South America"), ("CN", "Asia"),
    ("CZ", "Europe"), ("DE", "Europe"), ("DK", "Europe"), ("ES", "Europe"),
    ("FI", "Europe"), ("FR", "Europe"), ("GB", "Europe"), ("GR", "Europe"),
    ("HK", "Asia"), ("HU", "Europe"), ("ID", "Asia"), ("IE", "Europe"),
    ("IL", "Asia"), ("IN", "Asia"), ("IT", "Europe"), ("JP", "Asia"),
    ("KR", "Asia"), ("MX", "North America"), ("MY", "Asia"),
    ("NL", "Europe"), ("NO", "Europe"), ("NZ", "Oceania"), ("PL", "Europe"),
    ("PT", "Europe"), ("QA", "Asia"), ("SA", "Asia"), ("SE", "Europe"),
    ("SG", "Asia"), ("TH", "Asia"), ("TW", "Asia"), ("US", "North America"),
    ("ZA", "Africa"),
]

COMPLIANCE_FRAMEWORKS: list[tuple[str, str, str]] = [
    ("hipaa", "Health Insurance Portability and Accountability Act", "HIPAA"),
    ("soc2t2", "System and Organization Controls Report 2 Type 2", "SOC 2 Type 2"),
    ("iso27001", "ISO/IEC 27001", "ISO 27001"),
]

# benchmark catalog (lookup.py:213-767 shape): id, framework, unit, hib
BENCHMARKS: list[tuple[str, str, str, bool]] = [
    ("bogomips", "bogomips", "bogomips", True),
    ("bw_mem", "bw_mem", "MB/s", True),
    ("openssl", "openssl", "byte/s", True),
    ("geekbench:score", "geekbench", "score", True),
    ("passmark:cpu_mark", "passmark", "score", True),
    ("stress_ng:cpu_all", "stress-ng", "bogo ops/s", True),
    ("stress_ng:best1", "stress-ng", "bogo ops/s", True),
    ("stress_ng:bestn", "stress-ng", "bogo ops/s", True),
    ("redis:SET", "redis", "rps", True),
    ("static_web:rps", "binserve", "rps", True),
    ("llm_speed:prompt_processing", "llama.cpp", "token/s", True),
]


def countries(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(COUNTRIES, ["country_id", "continent"]) \
        .withColumn("status", F.lit("active")) \
        .withColumn("observed_at", F.current_timestamp())


def compliance_frameworks(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        COMPLIANCE_FRAMEWORKS,
        ["compliance_framework_id", "name", "abbreviation"],
    ).withColumn("status", F.lit("active")) \
     .withColumn("observed_at", F.current_timestamp())


def benchmarks(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        BENCHMARKS, ["benchmark_id", "framework", "unit", "higher_is_better"]
    ).withColumn("status", F.lit("active")) \
     .withColumn("observed_at", F.current_timestamp())
