"""Benchmark-corpus file readers + derivations (SURVEY.md §2.1 S6-S10,
§2.5 A12-A13, §2.9 F12-F14; reference inspector.py:137-757).

The reference walks a per-server directory tree of benchmark outputs; here
each format is one ``spark.read`` with the server id recovered from the
file path (``input_file_name``) — the whole corpus lands as one long
``benchmark_measurement`` DataFrame and every downstream step is
relational.

Parsers are native (csv/json/text + regexp). YAML (S8) needs a parse UDF
(yaml is not a Spark datasource); it is Arrow-batched and runs once per
file, not per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

from ..functions.scalars import dround

STRESSNG_SCHEMA = StructType([
    StructField("cores", IntegerType()),
    StructField("score", DoubleType()),
])


def _server_from_path(depth: int = 2) -> F.Column:
    """Server id = path segment ``depth`` levels above the file (the
    reference's <vendor>/<server>/<file> layout)."""
    parts = F.split(F.input_file_name(), "/")
    return F.element_at(parts, -depth)


def read_stressng_csv(spark: SparkSession, glob: str) -> DataFrame:
    """S7 — stressngfull.csv ``(cores,score)`` rows ordered by cores
    (inspector.py:216-221)."""
    return (
        spark.read.schema(STRESSNG_SCHEMA).option("header", "true")
        .csv(glob)
        .withColumn("server_id", _server_from_path())
    )


def stressng_derivations(df: DataFrame) -> DataFrame:
    """A12/A13 — best1 (score at fewest cores), bestn (max score),
    ecpus = bestn/best1, scalability = ecpus/cores*100
    (inspector.py:562-574, 1329-1376). min_by/max_by keep it one agg."""
    agg = df.groupBy("server_id").agg(
        F.min_by("score", "cores").alias("best1"),
        F.max("score").alias("bestn"),
        F.max("cores").alias("max_cores"),
    )
    ecpus = F.col("bestn") / F.col("best1")
    return agg.select(
        "server_id",
        F.col("best1"), F.col("bestn"),
        dround(ecpus, 4).alias("ecpus"),
        dround(ecpus / F.col("max_cores") * 100, 4).alias("scalability"),
    )


def read_bw_mem_lines(spark: SparkSession, glob: str) -> DataFrame:
    """S10 — regex line scan of text output: ``rd 64.00 57232.00``
    (op, size MB, MB/s) — lines not matching are dropped
    (inspector.py:305-312)."""
    lines = spark.read.text(glob).withColumn("server_id", _server_from_path())
    pat = r"^([a-z]+)\s+([0-9.]+)\s+([0-9.]+)\s*$"
    return (
        lines.filter(F.col("value").rlike(pat))
        .select(
            "server_id",
            F.regexp_extract("value", pat, 1).alias("operation"),
            F.regexp_extract("value", pat, 2).cast("double").alias("size_mb"),
            F.regexp_extract("value", pat, 3).cast("double").alias("mb_per_s"),
        )
    )


def read_geekbench_results(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — geekbench results.json: {"Single-Core Performance":
    {<workload>: {score, description}}, ...} -> one row per
    (section, workload) via map explode (inspector.py:137-213 shape)."""
    from pyspark.sql.types import MapType

    inner = MapType(StringType(), StructType([
        StructField("score", DoubleType()),
        StructField("description", StringType()),
    ]))
    raw = (
        spark.read.option("multiLine", "true")
        .text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    parsed = raw.select(
        "server_id",
        F.from_json("value", MapType(StringType(), inner)).alias("sections"),
    )
    sec = parsed.select(
        "server_id", F.explode("sections").alias("section", "workloads")
    )
    return sec.select(
        "server_id", "section",
        F.explode("workloads").alias("workload", "result"),
    ).select(
        "server_id", "section", "workload",
        F.col("result.score").alias("score"),
        F.col("result.description").alias("description"),
    )


REDIS_SCHEMA = StructType([
    StructField("size", StringType()),
    StructField("connections", DoubleType()),
    StructField("pipeline", DoubleType()),
    StructField("operation", StringType()),
    StructField("rps", DoubleType()),
    StructField("latency", DoubleType()),
    StructField("server_usr", DoubleType()),
    StructField("server_sys", DoubleType()),
    StructField("client_usr", DoubleType()),
    StructField("client_sys", DoubleType()),
])


def read_redis_csv(spark: SparkSession, glob: str) -> DataFrame:
    """S7 — redis/static_web DictReader-style CSV (inspector.py:585-593)."""
    return (
        spark.read.schema(REDIS_SCHEMA).option("header", "true").csv(glob)
        .withColumn("server_id", _server_from_path())
    )


def redis_derivations(df: DataFrame) -> DataFrame:
    """W1 top-1 rps per (server, op, size) + F12 throughput (rps x parsed
    size suffix) + F13 extrapolated score (inspector.py:599-624)."""
    size_bytes = (
        F.regexp_extract("size", r"^([0-9]+)", 1).cast("double")
        * F.when(F.lower(F.col("size")).endswith("k"), 1024)
        .when(F.lower(F.col("size")).endswith("m"), 1024 * 1024)
        .otherwise(1)
    )
    w = Window.partitionBy("server_id", "operation", "size").orderBy(
        F.col("rps").desc(), F.col("connections"), F.col("pipeline")
    )
    top = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    usrsys = F.col("server_usr") + F.col("server_sys")
    extrapolated = F.col("rps") / usrsys * (
        usrsys + F.col("client_usr") + F.col("client_sys")
    )
    return top.select(
        "server_id", "operation", "size",
        F.col("rps"),
        dround(F.col("rps") * size_bytes, 4).alias("throughput_bytes"),
        dround(extrapolated, 4).alias("rps_extrapolated"),
    )


def read_nvidia_smi_xml(spark: SparkSession, glob: str) -> DataFrame:
    """S9 — nvidia-smi XML output -> one row per GPU (inspector.py:193-198
    parses with ElementTree; same here, Arrow-batched per FILE not per
    row — stdlib xml, no spark-xml dependency)."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    out_schema = StructType([
        StructField("server_id", StringType()),
        StructField("product_name", StringType()),
        StructField("memory_total_mib", DoubleType()),
    ])

    def _parse(it):
        import xml.etree.ElementTree as ET

        import pandas as pd

        for pdf in it:
            rows = []
            for server_id, text in zip(pdf["server_id"], pdf["value"]):
                try:
                    root = ET.fromstring(text)
                except ET.ParseError:
                    continue
                for gpu in root.findall("gpu"):
                    name = gpu.findtext("product_name")
                    mem = gpu.findtext("fb_memory_usage/total", default="")
                    mib = None
                    if mem.endswith(" MiB"):
                        try:
                            mib = float(mem[:-4])
                        except ValueError:
                            pass
                    rows.append((server_id, name, mib))
            yield pd.DataFrame(
                rows, columns=["server_id", "product_name", "memory_total_mib"]
            )

    return raw.mapInPandas(_parse, out_schema)


def enrich_servers(servers: DataFrame,
                   lscpu: DataFrame | None = None,
                   stressng: DataFrame | None = None,
                   timings: DataFrame | None = None) -> DataFrame:
    """§2.12 — the relational form of ``inspect_update_server_dict``
    (inspector.py:1222-1453): HW-inspection measurements override
    vendor-declared columns when present (the reference's
    ``override_mapping``), expressed as broadcast left-joins + coalesce.

    Inputs (all optional, keyed by server_id):
    - ``lscpu(server_id, vcpus, cpu_cores, cpu_model_raw)`` — parsed
      lscpu fields (S6); cpu_model is standardized here (P9).
    - ``stressng(server_id, cores, score)`` — the scaling curve;
      ecpus = round(bestn/best1, 1), scalability =
      round(ecpus/cpu_cores*100, 2) (inspector.py:1329-1342, 1372-1376).
    - ``timings(server_id, api_start, machine_start)`` — A10 mean.

    One server row in, one enriched row out; the many-rows-out benchmark
    extraction lives in the reader+derivation functions above (the
    reference's UDTF shape becomes plain DataFrames).
    """
    from ..functions.standardize import standardize_cpu_model

    out = servers
    if lscpu is not None:
        insp = lscpu.select(
            "server_id",
            F.col("vcpus").alias("_i_vcpus"),
            F.col("cpu_cores").alias("_i_cores"),
            standardize_cpu_model(F.col("cpu_model_raw")).alias("_i_model"),
        )
        out = out.join(F.broadcast(insp), "server_id", "left")
        for tgt, src in [("vcpus", "_i_vcpus"), ("cpu_cores", "_i_cores"),
                         ("cpu_model", "_i_model")]:
            base = F.col(tgt) if tgt in out.columns else F.lit(None)
            out = out.withColumn(tgt, F.coalesce(F.col(src), base))
        out = out.drop("_i_vcpus", "_i_cores", "_i_model")
    if stressng is not None:
        curve = stressng.groupBy("server_id").agg(
            (F.max("score") / F.min_by("score", "cores")).alias("_ratio")
        ).select("server_id", F.round("_ratio", 1).alias("ecpus"))
        out = out.join(F.broadcast(curve), "server_id", "left")
        out = out.withColumn(
            "scalability",
            F.round(F.col("ecpus") / F.col("cpu_cores") * 100, 2),
        )
    if timings is not None:
        out = out.join(
            F.broadcast(average_time_to_start(timings)), "server_id", "left"
        )
    return out


def average_time_to_start(timings: DataFrame) -> DataFrame:
    """A10 — mean of positive (machine_start - api_start) durations per
    server, rounded to 2 (inspector.py:232-242). Rows with a missing
    endpoint or non-positive duration are excluded BEFORE the mean (the
    reference skips them, they don't contribute to the denominator)."""
    dur = F.col("machine_start").cast("double") - F.col("api_start").cast("double")
    return (
        timings.withColumn("_dur", dur)
        .filter(F.col("_dur").isNotNull() & (F.col("_dur") > 0))
        .groupBy("server_id")
        .agg(F.round(F.avg("_dur"), 2).alias("average_time_to_start"))
    )


def parse_passmark_yaml(spark: SparkSession, glob: str) -> DataFrame:
    """S8 — passmark stdout is YAML; no Spark datasource exists, so parse
    per file with an Arrow-batched pandas UDF over wholetext reads
    (yaml gated behind import-try: absent -> empty result, not a crash)."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )

    out_schema = StructType([
        StructField("server_id", StringType()),
        StructField("metric", StringType()),
        StructField("value", DoubleType()),
    ])

    def _parse(it):
        import pandas as pd

        try:
            import yaml  # type: ignore
        except ImportError:
            yaml = None
        for pdf in it:
            rows = []
            if yaml is not None:
                for server_id, text in zip(pdf["server_id"], pdf["value"]):
                    doc = yaml.safe_load(text) or {}
                    for metric, value in (doc.get("Results") or {}).items():
                        try:
                            rows.append((server_id, metric, float(value)))
                        except (TypeError, ValueError):
                            continue
            yield pd.DataFrame(rows, columns=["server_id", "metric", "value"])

    return raw.mapInPandas(_parse, out_schema)
