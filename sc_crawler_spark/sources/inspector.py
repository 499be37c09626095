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
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
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
    """S7 — redis/static_web DictReader-style CSV (inspector.py:585-593).

    BY FIELD NAME **per file**, like the reference's csv.DictReader:
    Spark CSV with an explicit schema maps columns positionally, and
    even header-first `spark.read.csv` over a multi-file glob takes
    the column names from ONE file and parses the rest positionally —
    so a server whose static_web.csv header order differs from its
    neighbors' would silently land rps in the wrong field. Read each
    file wholetext and parse it with csv.DictReader inside an
    Arrow-batched mapInPandas (same per-file tier as the YAML/XML
    sources); absent columns land as typed NULLs."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    fields = [(f.name, f.dataType) for f in REDIS_SCHEMA.fields]
    out_schema = StructType(
        list(REDIS_SCHEMA.fields) + [StructField("server_id", StringType())])

    def _parse(batches):
        import csv
        import io

        import pandas as pd

        for pdf in batches:
            rows = []
            for text, server in zip(pdf["value"], pdf["server_id"]):
                for rec in csv.DictReader(io.StringIO(text)):
                    row = {}
                    for name, dtype in fields:
                        v = rec.get(name)
                        if v in (None, ""):
                            row[name] = None
                        elif isinstance(dtype, DoubleType):
                            try:
                                row[name] = float(v)
                            except ValueError:
                                row[name] = None
                        else:
                            row[name] = v
                    row["server_id"] = server
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=[n for n, _ in fields] + ["server_id"])

    return raw.mapInPandas(_parse, out_schema)


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
    row — stdlib xml, no spark-xml dependency). Columns mirror
    `_gpu_details` (inspector.py:1043-1060): brand/architecture/model,
    fb memory MiB, firmware + vbios ("N/A" -> null), four max clocks."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    cols = ["server_id", "product_name", "memory_total_mib",
            "product_brand", "architecture", "firmware_version",
            "vbios_version", "graphics_clock_mhz", "sm_clock_mhz",
            "mem_clock_mhz", "video_clock_mhz"]
    out_schema = StructType(
        [StructField("server_id", StringType()),
         StructField("product_name", StringType()),
         StructField("memory_total_mib", DoubleType()),
         StructField("product_brand", StringType()),
         StructField("architecture", StringType()),
         StructField("firmware_version", StringType()),
         StructField("vbios_version", StringType())]
        + [StructField(c, IntegerType()) for c in cols[7:]]
    )

    def _parse(it):
        import xml.etree.ElementTree as ET

        import pandas as pd

        def dropna(text):  # inspector.py:1037-1040
            return None if text in (None, "N/A") else text

        def clock(gpu, name):  # "1710 MHz" -> 1710 (inspector.py:1053-1055)
            s = gpu.findtext(f"max_clocks/{name}", default="")
            try:
                return int(s[:-4])
            except ValueError:
                return None

        for pdf in it:
            rows = []
            for server_id, text in zip(pdf["server_id"], pdf["value"]):
                try:
                    root = ET.fromstring(text)
                except ET.ParseError:
                    continue
                for gpu in root.findall("gpu"):
                    mem = gpu.findtext("fb_memory_usage/total", default="")
                    mib = None
                    if mem.endswith(" MiB"):
                        try:
                            mib = float(mem[:-4])
                        except ValueError:
                            pass
                    rows.append((
                        server_id,
                        gpu.findtext("product_name"),
                        mib,
                        gpu.findtext("product_brand"),
                        gpu.findtext("product_architecture"),
                        dropna(gpu.findtext("gsp_firmware_version")),
                        dropna(gpu.findtext("vbios_version")),
                        clock(gpu, "graphics_clock"),
                        clock(gpu, "sm_clock"),
                        clock(gpu, "mem_clock"),
                        clock(gpu, "video_clock"),
                    ))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(_parse, out_schema)


def gpu_facts(gpus: DataFrame) -> DataFrame:
    """Per-server GPU aggregates from the nvidia-smi rows
    (inspector.py:1382-1390): mode()-based manufacturer/family/model
    (A8), count, min/total fb memory, plus the detail array. The
    "Quadro RTX" hypervisor misreport maps to NVIDIA before the mode
    (inspector.py:1057-1059)."""
    from ..functions.standardize import standardize_manufacturer

    manu = standardize_manufacturer(
        F.when(F.col("product_brand") == "Quadro RTX", "NVIDIA")
        .otherwise(F.col("product_brand"))
    )
    detail = F.struct(
        manu.alias("manufacturer"),
        F.col("architecture").alias("family"),
        F.col("product_name").alias("model"),
        F.col("memory_total_mib").alias("memory"),
    )
    return gpus.groupBy("server_id").agg(
        F.mode(manu).alias("gpu_manufacturer"),
        F.mode("architecture").alias("gpu_family"),
        F.mode("product_name").alias("gpu_model"),
        F.count("*").cast("int").alias("gpu_count"),
        F.min("memory_total_mib").alias("gpu_memory_min"),
        F.sum("memory_total_mib").alias("gpu_memory_total"),
        F.array_sort(F.collect_list(detail)).alias("gpus"),
    )


def read_virtualization_json(spark: SparkSession, glob: str) -> DataFrame:
    """virtualization stdout JSON ({"kvm": bool, ...},
    inspector.py:211-213) -> (server_id, hw_virt): the reference's
    hw_virt mapping reads the "kvm" key (inspector.py:1377)."""
    return (
        spark.read.schema("kvm boolean").json(glob)
        .withColumn("server_id", _server_from_path())
        .select("server_id", F.col("kvm").alias("hw_virt"))
    )


def enrich_servers(servers: DataFrame,
                   lscpu: DataFrame | None = None,
                   stressng: DataFrame | None = None,
                   timings: DataFrame | None = None,
                   cache_cols: DataFrame | None = None,
                   dmidecode: DataFrame | None = None,
                   gpu: DataFrame | None = None,
                   virtualization: DataFrame | None = None) -> DataFrame:
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
    - ``cache_cols`` — the eight cpu_l*_cache columns from
      ``cpu_cache_columns`` (inspector.py:1362-1369).
    - ``dmidecode`` — ``dmidecode_facts``: cpu_model fallback below
      lscpu (inspector.py:1285-1326) + memory_generation/memory_speed
      (inspector.py:1379-1381).

    One server row in, one enriched row out; the many-rows-out benchmark
    extraction lives in the reader+derivation functions above (the
    reference's UDTF shape becomes plain DataFrames).
    """
    from ..functions.standardize import standardize_cpu_model

    out = servers
    if dmidecode is not None:
        # dmidecode sits BELOW lscpu in the fallback order
        # (inspector.py:1285-1326: "fall back to dmidecode") but above
        # vendor-declared data — joined FIRST so the later lscpu
        # coalesce stacks lscpu -> dmidecode -> vendor;
        # memory_generation/memory_speed are dmidecode-only facts
        # (inspector.py:1379-1381).
        dmi = dmidecode.select(
            "server_id",
            standardize_cpu_model(F.col("cpu_model_dmi")).alias("_d_model"),
            F.col("memory_generation").alias("_d_gen"),
            F.col("memory_speed").alias("_d_speed"),
        )
        out = out.join(F.broadcast(dmi), "server_id", "left")
        for tgt, src in [("cpu_model", "_d_model"),
                         ("memory_generation", "_d_gen"),
                         ("memory_speed", "_d_speed")]:
            base = F.col(tgt) if tgt in out.columns else F.lit(None)
            out = out.withColumn(tgt, F.coalesce(F.col(src), base))
        out = out.drop("_d_model", "_d_gen", "_d_speed")
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
    if cache_cols is not None:
        # the eight cache columns (inspector.py:1362-1369): inspector
        # facts override vendor-declared values when present
        cc = cache_cols.select(
            "server_id",
            *[F.col(c).alias(f"_c_{c}") for c in cache_cols.columns
              if c != "server_id"],
        )
        out = out.join(F.broadcast(cc), "server_id", "left")
        for c in cache_cols.columns:
            if c == "server_id":
                continue
            base = F.col(c) if c in out.columns else F.lit(None)
            out = out.withColumn(c, F.coalesce(F.col(f"_c_{c}"), base))
        out = out.drop(*[f"_c_{c}" for c in cache_cols.columns
                         if c != "server_id"])
    if gpu is not None:
        # HW-inspected GPU facts override vendor-declared ones; servers
        # with no nvidia-smi rows keep vendor data (the reference's
        # "skip update if there is no HW-inspected GPU info",
        # inspector.py:1386-1390)
        gcols = [c for c in gpu.columns if c != "server_id"]
        g = gpu.select("server_id",
                       *[F.col(c).alias(f"_g_{c}") for c in gcols])
        out = out.join(F.broadcast(g), "server_id", "left")
        for c in gcols:
            base = F.col(c) if c in out.columns else F.lit(None)
            out = out.withColumn(c, F.coalesce(F.col(f"_g_{c}"), base))
        out = out.drop(*[f"_g_{c}" for c in gcols])
    if virtualization is not None:
        v = virtualization.select("server_id",
                                  F.col("hw_virt").alias("_v_hw"))
        out = out.join(F.broadcast(v), "server_id", "left")
        base = F.col("hw_virt") if "hw_virt" in out.columns else F.lit(None)
        out = out.withColumn("hw_virt", F.coalesce(F.col("_v_hw"), base))
        out = out.drop("_v_hw")
    if stressng is not None:
        curve = stressng.groupBy("server_id").agg(
            (F.max("score") / F.min_by("score", "cores")).alias("_ratio")
        ).select("server_id", F.round("_ratio", 1).alias("_i_ecpus"))
        out = out.join(F.broadcast(curve), "server_id", "left")
        base = F.col("ecpus") if "ecpus" in out.columns else F.lit(None)
        out = out.withColumn("ecpus", F.coalesce(F.col("_i_ecpus"), base))
        # inspector overrides only where it MEASURED: servers with no
        # stressng rows keep their vendor-declared scalability (the
        # coalesce pattern every other branch uses), and the derivation
        # needs cpu_cores to exist at all
        if "cpu_cores" in out.columns:
            derived = F.round(
                F.col("_i_ecpus") / F.col("cpu_cores") * 100, 2)
            sbase = (F.col("scalability")
                     if "scalability" in out.columns else F.lit(None))
            out = out.withColumn("scalability", F.coalesce(derived, sbase))
        out = out.drop("_i_ecpus")
    if timings is not None:
        atts = average_time_to_start(timings).withColumnRenamed(
            "average_time_to_start", "_i_atts")
        out = out.join(F.broadcast(atts), "server_id", "left")
        base = (F.col("average_time_to_start")
                if "average_time_to_start" in out.columns
                else F.lit(None))
        out = out.withColumn("average_time_to_start",
                             F.coalesce(F.col("_i_atts"), base)
                             ).drop("_i_atts")
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
                    try:
                        doc = yaml.safe_load(text) or {}
                    except yaml.YAMLError:
                        continue  # garbled file: skip, like the XML readers
                    if not isinstance(doc, dict):
                        continue  # e.g. an error message parsed as a str
                    for metric, value in (doc.get("Results") or {}).items():
                        try:
                            rows.append((server_id, metric, float(value)))
                        except (TypeError, ValueError):
                            continue
            yield pd.DataFrame(rows, columns=["server_id", "metric", "value"])

    return raw.mapInPandas(_parse, out_schema)


# ------------------------------------------- S6: lscpu/lshw/lsblk/openssl

LSCPU_SCHEMA = (
    "lscpu array<struct<field:string,data:string,"
    "children:array<struct<field:string,data:string>>>>"
)


def read_lscpu_json(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — ``lscpu -J`` stdout -> one typed row per server
    (inspector.py:147-157, 1276-1340): vcpus, physical cores, raw model
    name (P9 standardization happens in ``enrich_servers``), CPU speed
    from the ``@ X.XGHz`` suffix, manufacturer/family detection,
    BogoMIPS, flags. Native JSON + explode — no UDF."""
    raw = (
        spark.read.schema(LSCPU_SCHEMA).json(glob)
        .withColumn("server_id", _server_from_path())
    )
    fields = raw.select(
        "server_id",
        F.explode(
            F.flatten(F.array(
                F.transform("lscpu", lambda e: F.struct(
                    e["field"].alias("field"), e["data"].alias("data"))),
                F.flatten(F.transform(
                    "lscpu",
                    lambda e: F.coalesce(
                        F.transform(e["children"], lambda c: F.struct(
                            c["field"].alias("field"), c["data"].alias("data"))),
                        F.array().cast(
                            "array<struct<field:string,data:string>>"),
                    ))),
            ))
        ).alias("kv"),
    ).select("server_id", F.col("kv.field").alias("field"),
             F.col("kv.data").alias("data"))

    def fld(name):
        return F.first(F.when(F.col("field") == name, F.col("data")),
                       ignorenulls=True)

    model = fld("Model name:")
    return fields.groupBy("server_id").agg(
        fld("CPU(s):").cast("int").alias("vcpus"),
        (fld("Core(s) per socket:").cast("int")
         * fld("Socket(s):").cast("int")).alias("cpu_cores"),
        model.alias("cpu_model_raw"),
        F.regexp_extract(model, r" @ ([0-9\.]*)GHz$", 1)
        .cast("double").alias("cpu_speed"),
        # manufacturer/family token scan (inspector.py:1296-1322)
        F.when(F.lower(model).contains("intel"), "Intel")
        .when(F.lower(model).contains("amd"), "AMD")
        .when(F.lower(model).contains("ampere"), "Ampere")
        .alias("cpu_manufacturer"),
        F.when(F.lower(model).contains("xeon"), "Xeon")
        .when(F.lower(model).contains("epyc"), "EPYC")
        .when(F.lower(model).contains("altra"), "Altra")
        .alias("cpu_family"),
        F.round(fld("BogoMIPS:").cast("double")).alias("bogomips"),
        F.split(fld("Flags:"), " ").alias("cpu_flags"),
    )


LSBLK_SCHEMA = (
    "blockdevices array<struct<name:string,size:long,rota:boolean,"
    "type:string,tran:string,model:string>>"
)


def read_lsblk_json(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — ``lsblk -J -b`` stdout -> one row per physical disk
    (inspector.py:178-190, 1182-1220): type='disk' rows only,
    rota -> hdd, nvme transport -> 'nvme ssd', else ssd; size bytes ->
    GB. Native JSON + explode."""
    raw = (
        spark.read.schema(LSBLK_SCHEMA).json(glob)
        .withColumn("server_id", _server_from_path())
    )
    d = raw.select("server_id",
                   F.explode("blockdevices").alias("d")).filter(
        F.col("d.type") == "disk")
    return d.select(
        "server_id",
        F.col("d.name").alias("name"),
        (F.col("d.size") / F.lit(1e9)).cast("long").alias("size_gb"),
        F.when(F.col("d.rota"), "hdd")
        .when(F.col("d.tran") == "nvme", "nvme ssd")
        .otherwise("ssd").alias("storage_type"),
        F.col("d.model").alias("model"),
    )


def storage_summary(disks: DataFrame) -> DataFrame:
    """storage_type of the LARGEST disk + total size per server
    (inspector.py:1211-1219)."""
    return disks.groupBy("server_id").agg(
        F.max_by("storage_type", "size_gb").alias("storage_type"),
        F.sum("size_gb").alias("storage_size"),
        F.count("*").alias("n_disks"),
    )


# ---------------------------------- vendor-aware storage-disk discovery

# Whether the vendor boots from an attached network drive — the first
# nvme device is then the boot drive and NOT a bundled local disk
# (inspector.py:1086-1095, "Info from sc_runner/resources").
_BOOT_FROM_NETWORK = {
    "alicloud": True, "aws": True, "azure": True, "gcp": True,
    "hcloud": False, "ovh": False, "upcloud": True, "vultr": False,
}

LSBLK_RAW_SCHEMA = (
    "blockdevices array<struct<name:string,size:long,subsystems:string>>"
)


def storage_disks_lsblk(spark: SparkSession, glob: str) -> DataFrame:
    """`_find_storage_disks_from_lsblk` (inspector.py:1070-1129): local
    nvmeN devices past the vendor's boot-drive offset land as nvme ssd
    (description = the nvme index, used only for ordering), and the
    Hetzner/OVH virtio-scsi `sda` lands as a network drive. Sizes are
    decimal GB (bytes // 1000^3)."""
    raw = (
        spark.read.schema(LSBLK_RAW_SCHEMA).json(glob)
        .withColumn("server_id", _server_from_path())
        .withColumn("vendor_id", _server_from_path(3))
    )
    d = raw.select("vendor_id", "server_id",
                   F.explode("blockdevices").alias("d"))
    # the reference raises KeyError for vendors absent from its
    # boot-from-network table (skipping the framework); mirroring the
    # fallthrough as "boots locally" would hand an UNKNOWN vendor a
    # phantom local nvme data disk out of its boot drive — drop those
    # rows instead of guessing an offset
    d = d.filter(F.col("vendor_id").isin(list(_BOOT_FROM_NETWORK)))
    boot_net = F.col("vendor_id").isin(
        [v for v, b in _BOOT_FROM_NETWORK.items() if b])
    nvme_idx = F.nullif(
        F.regexp_extract(F.col("d.name"), r"^nvme(\d+)", 1), F.lit("")
    ).cast("int")
    size_gb = F.floor(F.col("d.size") / F.lit(1000 ** 3)).cast("long")
    is_nvme = nvme_idx >= F.when(boot_net, 1).otherwise(0)
    is_virtio = (
        ~boot_net & (F.col("d.name") == "sda")
        & (F.col("d.subsystems") == "block:scsi:virtio:pci")
    )
    return (
        d.filter(F.coalesce(is_nvme, F.lit(False)) | is_virtio)
        .select(
            "vendor_id", "server_id",
            size_gb.alias("size"),
            F.when(F.coalesce(is_nvme, F.lit(False)), "nvme ssd")
            .otherwise("network").alias("storage_type"),
            F.when(F.coalesce(is_nvme, F.lit(False)),
                   nvme_idx.cast("string")).alias("description"),
        )
    )


def storage_disks_lshw(spark: SparkSession, glob: str) -> DataFrame:
    """`_find_storage_disks_from_lshw` + `_determine_storage_type`
    (inspector.py:1132-1179): disks under class=storage controllers,
    typed by vendor-specific controller/product rules; GCP network
    disks are skipped (added manually, not bundled). Arbitrary-depth
    recursion -> per-FILE Arrow-batched parse like read_lshw_json."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
        .withColumn("vendor_id", _server_from_path(3))
    )
    out_schema = StructType([
        StructField("vendor_id", StringType()),
        StructField("server_id", StringType()),
        StructField("size", LongType()),
        StructField("storage_type", StringType()),
        StructField("description", StringType()),
    ])

    def _storage_type(vendor, product, desc):
        if vendor == "gcp" and "-pd" in product:
            return "network"
        if vendor == "aws" and "amazon elastic block store" in product:
            return "network"
        if vendor == "upcloud" and "virtio block device" in product:
            return "network"
        if "nvme" in desc:
            return "nvme ssd"
        return "ssd"

    def _walk(node, vendor, acc):
        if not isinstance(node, dict):
            return
        if node.get("class", "") == "storage":
            product = node.get("product", "").lower()
            for child in node.get("children", []) or []:
                if not isinstance(child, dict):
                    continue
                if child.get("class") == "disk" and "size" in child:
                    stype = _storage_type(
                        vendor, product,
                        child.get("description", "").lower())
                    if vendor == "gcp" and stype == "network":
                        continue
                    acc.append((child.get("size", 0) // 1000 ** 3,
                                stype, product))
        for child in node.get("children", []) or []:
            _walk(child, vendor, acc)

    def _parse(it):
        import json as _json

        import pandas as pd

        for pdf in it:
            rows = []
            for vendor, server_id, text in zip(
                    pdf["vendor_id"], pdf["server_id"], pdf["value"]):
                try:
                    obj = _json.loads(text)
                except ValueError:
                    continue
                acc: list = []
                for node in obj if isinstance(obj, list) else [obj]:
                    _walk(node, vendor, acc)
                rows.extend((vendor, server_id, s, t, d) for s, t, d in acc)
            yield pd.DataFrame(
                rows, columns=["vendor_id", "server_id", "size",
                               "storage_type", "description"])

    return raw.mapInPandas(_parse, out_schema)


def storage_info(lsblk_disks: DataFrame,
                 lshw_disks: DataFrame | None = None) -> DataFrame:
    """`_parse_storage_info` (inspector.py:1182-1219): per server,
    lsblk-discovered disks win outright; lshw only fills servers where
    lsblk found nothing. Disks sort by the product-name key (first
    number in the description, description length, size), descriptions
    are then dropped; storage_type = the LARGEST disk's type (first
    max in sort order), storage_size = size sum.

    Output: (server_id, storage_type, storage_size,
    storages: array<struct<size,storage_type>>).
    """
    src = lsblk_disks
    if lshw_disks is not None:
        only_lshw = lshw_disks.join(
            lsblk_disks.select("server_id").distinct(), "server_id",
            "left_anti")
        src = lsblk_disks.unionByName(only_lshw)

    num = F.nullif(
        F.regexp_extract(F.coalesce("description", F.lit("")),
                         r"(\d+)", 1), F.lit("")).cast("int")
    keyed = src.select(
        "server_id",
        F.struct(
            F.when(num.isNull(), 1).otherwise(0).alias("no_number"),
            F.coalesce(num, F.lit(0)).alias("number"),
            F.length(F.coalesce("description", F.lit("")))
            .alias("desc_len"),
            F.col("size").alias("size"),
            F.col("storage_type").alias("storage_type"),
        ).alias("d"),
    )
    arr = F.array_sort(F.collect_list("d"))
    largest = F.aggregate(
        arr,
        F.struct(F.lit(-1).cast("long").alias("size"),
                 F.lit(None).cast("string").alias("storage_type")),
        lambda acc, d: F.when(
            d["size"] > acc["size"],
            F.struct(d["size"].alias("size"),
                     d["storage_type"].alias("storage_type")),
        ).otherwise(acc),
    )
    return keyed.groupBy("server_id").agg(
        largest["storage_type"].alias("storage_type"),
        F.aggregate(arr, F.lit(0).cast("long"),
                    lambda acc, d: acc + d["size"]).alias("storage_size"),
        # descriptions are cleared after the sort (inspector.py:1212-1214
        # "not informative enough"); the null field keeps the struct
        # shape DISK_STRUCT-compatible for server-table updates
        F.transform(
            arr,
            lambda d: F.struct(d["size"].alias("size"),
                               d["storage_type"].alias("storage_type"),
                               F.lit(None).cast("string")
                               .alias("description")),
        ).alias("storages"),
    )


OPENSSL_SCHEMA = "algo string, block_size long, speed double"


def read_openssl_json(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — openssl parsed.json -> benchmark rows with
    config={algo, block_size}, score=speed (inspector.py:478-494)."""
    return (
        spark.read.schema(OPENSSL_SCHEMA).json(glob)
        .withColumn("server_id", _server_from_path())
        .select("server_id",
                F.lit("openssl").alias("benchmark_id"),
                "algo", "block_size",
                F.col("speed").cast("double").alias("score"))
    )


def read_lshw_json(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — lshw JSON (recursively nested ``children``) -> one row per
    server with the memory amount (inspector_helpers.py:123-161:
    first ``memory*`` node's size, else the sum of its ``bank*``
    children). Arbitrary-depth recursion has no Spark schema, so this is
    a per-FILE Arrow-batched parse like yaml/xml — the corpus is one
    file per server, never row-scale Python."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    out_schema = StructType([
        StructField("server_id", StringType()),
        StructField("memory_amount_mib", DoubleType()),
    ])

    def _find(obj):
        if isinstance(obj, list):
            for o in obj:
                v = _find(o)
                if v is not None:
                    return v
            return None
        if not isinstance(obj, dict):
            return None
        if obj.get("id", "").lower().startswith("memory"):
            size = obj.get("size")
            if isinstance(size, int) and size > 0:
                return size // 1024**2
            banks = sum(
                c.get("size", 0) for c in obj.get("children", []) or []
                if isinstance(c, dict)
                and c.get("id", "").lower().startswith("bank")
                and isinstance(c.get("size"), int) and c.get("size") > 0
            )
            if banks > 0:
                return banks // 1024**2
        for child in obj.get("children", []) or []:
            v = _find(child)
            if v is not None:
                return v
        return None

    def _parse(it):
        import json as _json

        import pandas as pd

        for pdf in it:
            rows = []
            for server_id, text in zip(pdf["server_id"], pdf["value"]):
                try:
                    mib = _find(_json.loads(text))
                except ValueError:
                    mib = None
                rows.append((server_id,
                             float(mib) if mib is not None else None))
            yield pd.DataFrame(rows,
                               columns=["server_id", "memory_amount_mib"])

    return raw.mapInPandas(_parse, out_schema)


def read_lstopo_xml(spark: SparkSession, glob: str) -> DataFrame:
    """S9 — hwloc lstopo XML -> (server_id, memory_amount_mib, n_cores)
    (inspector_helpers.py:92-120: sum of Misc/MemoryModule Size KiB where
    Type is RAM; inspector_helpers.py:150-157: Core element count).
    Same per-file ElementTree pattern as nvidia-smi."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    out_schema = StructType([
        StructField("server_id", StringType()),
        StructField("memory_amount_mib", DoubleType()),
        StructField("n_cores", IntegerType()),
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
                total_kib = 0
                n_cores = 0
                for elem in root.iter():
                    if elem.get("type") == "Core":
                        n_cores += 1
                    if (elem.get("type") == "Misc"
                            and elem.get("subtype") == "MemoryModule"):
                        infos = {i.get("name"): i.get("value")
                                 for i in elem.iter("info")}
                        if infos.get("Type") not in (None, "RAM"):
                            continue
                        try:
                            # `or ""`: a <info name="Size"/> with no
                            # value attribute maps to None (the dict
                            # default only covers ABSENT keys), and
                            # int(None) is a TypeError the old except
                            # didn't catch
                            total_kib += int(infos.get("Size") or "")
                        except ValueError:
                            continue
                rows.append((server_id,
                             float(total_kib // 1024) if total_kib > 0 else None,
                             n_cores))
            yield pd.DataFrame(
                rows,
                columns=["server_id", "memory_amount_mib", "n_cores"])

    return raw.mapInPandas(_parse, out_schema)


# --------------------------------------- CPU cache hierarchy + dmidecode

# lscpu field -> cache level (inspector_helpers.py:8-13); data strings
# look like "262144 (4 instances)" / "67108864 (1 instance)" / "262144"
# with the byte total first (inspector_helpers.py:66-83).
LSCPU_CACHE_FIELDS = {
    "L1d cache:": "L1d", "L1i cache:": "L1i",
    "L2 cache:": "L2", "L3 cache:": "L3",
}
# cache level -> hwloc lstopo XML object type (inspector_helpers.py:16-21)
LSTOPO_CACHE_TYPES = {
    "L1d": "L1Cache", "L1i": "L1iCache", "L2": "L2Cache", "L3": "L3Cache",
}


def read_lscpu_caches(spark: SparkSession, glob: str) -> DataFrame:
    """lscpu cache facts -> (server_id, level, total_bytes, instances)
    (inspector_helpers.py:293-318 `_extract_cache_info` +
    :66-83 `_parse_cache_data_string`; instances defaults to 1)."""
    raw = (
        spark.read.schema(LSCPU_SCHEMA).json(glob)
        .withColumn("server_id", _server_from_path())
    )
    fields = raw.select(
        "server_id",
        F.explode("lscpu").alias("kv"),
    ).select("server_id", F.col("kv.field").alias("field"),
             F.col("kv.data").alias("data"))
    level = F.col("field")
    for fld, lvl in LSCPU_CACHE_FIELDS.items():
        level = F.when(F.col("field") == fld, lvl).otherwise(level)
    return (
        fields.filter(F.col("field").isin(list(LSCPU_CACHE_FIELDS))
                      & F.col("data").isNotNull())
        .select(
            "server_id",
            level.alias("level"),
            F.regexp_extract("data", r"^\s*(\d+)", 1)
            .cast("long").alias("total_bytes"),
            F.coalesce(
                F.nullif(F.regexp_extract("data", r"\((\d+)\s+instance", 1),
                         F.lit("")).cast("int"),
                F.lit(1),
            ).alias("instances"),
        )
        .filter(F.col("total_bytes").isNotNull())
    )


def read_lstopo_caches(spark: SparkSession, glob: str) -> DataFrame:
    """lstopo XML cache objects -> (server_id, level, total_bytes,
    instances): per level, total = sum of `cache_size`, instances =
    object count (inspector_helpers.py:183-216 `_parse_lstopo_caches` +
    :219-244 aggregation). Used to OVERRIDE lscpu when the hypervisor
    misreports topology (e.g. one L3 per vCPU instead of shared)."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    out_schema = StructType([
        StructField("server_id", StringType()),
        StructField("level", StringType()),
        StructField("total_bytes", LongType()),
        StructField("instances", IntegerType()),
    ])

    def _parse(it):
        import xml.etree.ElementTree as ET

        import pandas as pd

        type_to_level = {v: k for k, v in LSTOPO_CACHE_TYPES.items()}
        for pdf in it:
            rows = []
            for server_id, text in zip(pdf["server_id"], pdf["value"]):
                try:
                    root = ET.fromstring(text)
                except ET.ParseError:
                    continue
                per_level: dict[str, list[int]] = {}
                for elem in root.iter():
                    lvl = type_to_level.get(elem.get("type"))
                    if lvl is None:
                        continue
                    try:
                        size = int(elem.get("cache_size") or "")
                    except ValueError:
                        continue
                    per_level.setdefault(lvl, []).append(size)
                for lvl, sizes in per_level.items():
                    rows.append((server_id, lvl, sum(sizes), len(sizes)))
            yield pd.DataFrame(
                rows,
                columns=["server_id", "level", "total_bytes", "instances"])

    return raw.mapInPandas(_parse, out_schema)


def cpu_cache_columns(lscpu_caches: DataFrame,
                      lstopo_caches: DataFrame | None = None) -> DataFrame:
    """Merge lscpu + lstopo cache facts into the server table's eight
    cache columns (inspector.py:1362-1369): per-instance and total KiB
    per level, lstopo winning per (server, level) when present
    (inspector_helpers.py:219-244). KiB = floor(bytes/1024) after the
    floor-divide per-instance split (CpuCacheInfo.as_dict)."""
    merged = lscpu_caches
    if lstopo_caches is not None:
        topo = lstopo_caches.select(
            "server_id", "level",
            F.col("total_bytes").alias("_t_bytes"),
            F.col("instances").alias("_t_inst"),
        )
        merged = (
            lscpu_caches.join(topo, ["server_id", "level"], "full")
            .select(
                "server_id", "level",
                F.coalesce("_t_bytes", "total_bytes").alias("total_bytes"),
                F.coalesce("_t_inst", "instances").alias("instances"),
            )
        )
    per_kib = F.floor(
        F.floor(F.col("total_bytes") / F.col("instances")) / 1024
    ).cast("int")
    total_kib = F.floor(F.col("total_bytes") / 1024).cast("int")
    longf = merged.select("server_id", "level", per_kib.alias("_per"),
                          total_kib.alias("_tot"))

    def pick(lvl, col):
        return F.first(F.when(F.col("level") == lvl, F.col(col)),
                       ignorenulls=True)

    return longf.groupBy("server_id").agg(*[
        pick(lvl, c).alias(f"cpu_{lvl.lower()}_cache{suffix}")
        for lvl in ("L1d", "L1i", "L2", "L3")
        for c, suffix in (("_per", ""), ("_tot", "_total"))
    ])


DMIDECODE_SCHEMA = "name string, props map<string,string>"


def read_dmidecode_json(spark: SparkSession, glob: str) -> DataFrame:
    """dmidecode parsed.json (top-level array of {name, props} sections,
    reference inspector.py:165-175) -> one row per section with file
    order stamped (`_pos`): `_server_dmidecode_section` takes the FIRST
    matching section, so order is part of the contract."""
    return (
        spark.read.schema(DMIDECODE_SCHEMA).option("multiLine", "true")
        .json(glob)
        .withColumn("server_id", _server_from_path())
        .withColumn("_pos", F.monotonically_increasing_id())
    )


def dmidecode_facts(sections: DataFrame) -> DataFrame:
    """Per-server dmidecode-derived facts (reference inspector.py
    mappings):

    - memory_amount_mib — the Memory Device Size bytes are SUMMED
      first, then floor-divided by 1024^2, exactly like the reference
      (inspector_helpers.py:168-170: ``sum(...) // 1024**2``); the LAST
      hop of the memory_amount_actual chain (inspector.py:1345-1351);
    - memory_generation / memory_speed — Type / Speed of the FIRST
      Memory Device (inspector.py:1379-1381; Speed Hz -> MHz via 1e6);
    - cpu fallbacks — Manufacturer / Family / Version / Max Speed (GHz)
      of the first Processor Information section, used when lscpu is
      missing (inspector.py:1285-1326).
    """
    mem = F.col("name") == "Memory Device"
    cpu = F.col("name") == "Processor Information"

    def first_prop(cond, key):
        return F.min_by(F.when(cond, F.col("props")[key]), F.when(cond, F.col("_pos")))

    return sections.groupBy("server_id").agg(
        F.floor(
            F.sum(F.when(mem, F.col("props")["Size"].cast("long")))
            / F.lit(1024 ** 2)
        ).cast("long").alias("memory_amount_mib"),
        first_prop(mem, "Type").alias("memory_generation"),
        dround(first_prop(mem, "Speed").cast("long") / 1e6, 6)
        .alias("memory_speed"),
        first_prop(cpu, "Manufacturer").alias("cpu_manufacturer_dmi"),
        first_prop(cpu, "Family").alias("cpu_family_dmi"),
        first_prop(cpu, "Version").alias("cpu_model_dmi"),
        dround(first_prop(cpu, "Max Speed").cast("double") / 1e9, 6)
        .alias("cpu_speed_dmi"),
    )


MEMBENCH_SCHEMA = StructType([
    StructField("operation", StringType()),
    StructField("size_kb", DoubleType()),
    StructField("latency_ns", DoubleType()),
    StructField("bandwidth_mb_s", DoubleType()),
])


def read_membench_csv(spark: SparkSession, glob: str) -> DataFrame:
    """S7 — membench CSV (reference inspector.py:642-657): one row per
    (operation, working-set size). ``_pos`` stamps file order — the
    RAM-scope emission needs the FIRST qualifying row per operation,
    and CSV row order is the only order the file carries."""
    return (
        spark.read.schema(MEMBENCH_SCHEMA).option("header", "true")
        .csv(glob)
        .withColumn("server_id", _server_from_path())
        .withColumn("_pos", F.monotonically_increasing_id())
    )


def membench_benchmarks(df: DataFrame,
                        cache: DataFrame | None = None) -> DataFrame:
    """membench rows -> benchmark_score-shaped rows (reference
    inspector.py:642-719):

    - ``latency`` -> ``membench:latency`` scoring ``latency_ns``;
      ``read``/``write``/``copy`` -> ``membench:bandwidth_<op>``
      scoring ``bandwidth_mb_s``; zero scores dropped BEFORE anything
      else (the reference ``continue``s before the RAM bookkeeping);
    - config is the canonical sorted-JSON ``{"size_kb": N}`` (int);
    - per (server, operation), the FIRST non-zero row in file order
      whose size exceeds the server's total CPU cache additionally
      emits a ``{"scope": "RAM"}`` row with the same score — the
      cache bound is ``coalesce(l3, l2, l1d)`` total KiB
      (inspector.py:652-656); servers without cache facts emit no
      RAM rows.

    One narrow window over per-server file rows; ``cache`` is a
    broadcast dim — nothing here shuffles the wide corpus.
    """
    score = F.when(F.col("operation") == "latency", F.col("latency_ns")) \
             .otherwise(F.col("bandwidth_mb_s"))
    bid = F.when(F.col("operation") == "latency", F.lit("membench:latency")) \
           .otherwise(F.concat(F.lit("membench:bandwidth_"),
                               F.col("operation")))
    base = (
        df.filter(F.col("operation").isin(
            "latency", "read", "write", "copy"))
        .withColumn("_score", score)
        .filter(F.col("_score").isNotNull() & (F.col("_score") != 0))
        .withColumn("benchmark_id", bid)
    )
    sized = base.select(
        "server_id", "benchmark_id",
        F.to_json(F.struct(
            F.col("size_kb").cast("long").alias("size_kb")),
            {"ignoreNullFields": "false"}).alias("config"),
        F.col("_score").alias("score"),
    )
    if cache is None:
        return sized
    bound = cache.select(
        "server_id",
        F.coalesce("cpu_l3_cache_total", "cpu_l2_cache_total",
                   "cpu_l1d_cache_total").alias("_cache_kib"),
    ).filter(F.col("_cache_kib").isNotNull())
    w = Window.partitionBy("server_id", "operation").orderBy("_pos")
    ram = (
        base.join(F.broadcast(bound), "server_id")
        .filter(F.col("size_kb") > F.col("_cache_kib"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "server_id", "benchmark_id",
            F.lit('{"scope":"RAM"}').alias("config"),
            F.col("_score").alias("score"),
        )
    )
    return sized.unionByName(ram)


# compression_text stdout JSON: {algo: {level: [measurement...]}} — the
# dynamic algo/level keys parse natively as nested maps, no UDF
_COMPRESSION_SCHEMA = (
    "map<string,map<string,array<struct<"
    "threads:int,ratio:double,compress:double,decompress:double,"
    "extra_args:struct<block_size:int>>>>>"
)


def read_compression_text_json(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — compression_text stdout JSON -> benchmark_score-shaped rows
    (reference inspector.py:373-402): one row per (algo, level, run,
    measurement) for measurement in ratio/compress/decompress, skipping
    falsy values. Config carries algo, compression_level (NULL when the
    level key is the string 'null'), cores = multi when threads > 1
    (:381-388), plus block_size only when present — canonical
    sorted-key JSON, null level KEPT, absent block_size OMITTED
    (matching python ``json.dumps`` of the reference's dict)."""
    raw = (
        spark.read.text(glob, wholetext=True)
        .withColumn("server_id", _server_from_path())
    )
    runs = (
        raw.select("server_id",
                   F.explode(F.from_json("value", _COMPRESSION_SCHEMA))
                   .alias("algo", "levels"))
        .select("server_id", "algo",
                F.explode("levels").alias("level", "datas"))
        .select("server_id", "algo", "level",
                F.explode("datas").alias("d"))
    )
    lvl = F.when(F.col("level") != "null",
                 F.col("level").cast("int")).otherwise(F.lit(None))
    cores = F.when(F.col("d.threads") > 1, "multi").otherwise("single")
    with_bs = F.to_json(F.struct(
        F.col("algo").alias("algo"),
        F.col("d.extra_args.block_size").alias("block_size"),
        lvl.alias("compression_level"),
        cores.alias("cores"),
    ), {"ignoreNullFields": "false"})
    without_bs = F.to_json(F.struct(
        F.col("algo").alias("algo"),
        lvl.alias("compression_level"),
        cores.alias("cores"),
    ), {"ignoreNullFields": "false"})
    cfg = F.when(F.col("d.extra_args.block_size").isNotNull(), with_bs) \
           .otherwise(without_bs)
    measures = F.array(*[
        F.struct(F.lit(m).alias("m"), F.col(f"d.{m}").alias("v"))
        for m in ("ratio", "compress", "decompress")
    ])
    return (
        runs.withColumn("config", cfg)
        .select("server_id", "config", F.explode(measures).alias("mv"))
        .filter(F.col("mv.v").isNotNull() & (F.col("mv.v") != 0))
        .select(
            "server_id",
            F.concat(F.lit("compression_text:"), F.col("mv.m"))
            .alias("benchmark_id"),
            "config",
            F.col("mv.v").alias("score"),
        )
    )


def read_llm_speed_json(spark: SparkSession, glob: str) -> DataFrame:
    """S6 — llm inference speed JSONL -> benchmark_score-shaped rows
    (reference inspector.py:728-753): one stdout line per run with
    ``model_filename``, ``n_prompt``, ``n_gen``, ``avg_ts``. The
    benchmark splits on the run shape — ``llm_speed:prompt_processing``
    when n_prompt != 0, else ``llm_speed:text_generation`` — config is
    {model: basename(model_filename) or 'unknown',
    tokens: n_prompt + n_gen}, score = avg_ts. JSONL parses natively
    (one JSON document per line); rows without avg_ts are dropped like
    the reference's KeyError skip."""
    df = (
        spark.read.json(glob)
        .withColumn("server_id", _server_from_path())
    )
    model = F.coalesce(
        F.regexp_extract(F.col("model_filename"), r"([^/]+)$", 1),
        F.lit("unknown"))
    model = F.when(model == "", "unknown").otherwise(model)
    bid = F.when(F.col("n_prompt") != 0, "llm_speed:prompt_processing") \
           .otherwise(F.lit("llm_speed:text_generation"))
    return (
        df.filter(F.col("avg_ts").isNotNull())
        .select(
            "server_id",
            bid.alias("benchmark_id"),
            F.to_json(F.struct(
                model.alias("model"),
                (F.col("n_prompt") + F.col("n_gen")).cast("long")
                .alias("tokens")),
                {"ignoreNullFields": "false"}).alias("config"),
            F.col("avg_ts").cast("double").alias("score"),
        )
    )


def bogomips_benchmark(lscpu: DataFrame) -> DataFrame:
    """The reference's first benchmark row (inspector.py:343-354):
    ``bogomips`` scored as the rounded lscpu BogoMIPS field, no config."""
    return lscpu.filter(F.col("bogomips").isNotNull()).select(
        "server_id",
        F.lit("bogomips").alias("benchmark_id"),
        F.lit(None).cast("string").alias("config"),
        F.col("bogomips").cast("double").alias("score"),
    )


# passmark Results key -> published benchmark name (inspector.py:53-70);
# benchmark_id = "passmark:" + the name slugged to snake-ish lowercase
_PASSMARK_MAPS = {
    "SUMM_CPU": "CPU Mark",
    "CPU_INTEGER_MATH": "CPU Integer Maths Test",
    "CPU_FLOATINGPOINT_MATH": "CPU Floating Point Maths Test",
    "CPU_PRIME": "CPU Prime Numbers Test",
    "CPU_SORTING": "CPU String Sorting Test",
    "CPU_ENCRYPTION": "CPU Encryption Test",
    "CPU_COMPRESSION": "CPU Compression Test",
    "CPU_SINGLETHREAD": "CPU Single Threaded Test",
    "CPU_PHYSICS": "CPU Physics Test",
    "CPU_MATRIX_MULT_SSE": "CPU Extended Instructions Test",
    "SUMM_ME": "Memory Mark",
    "ME_ALLOC_S": "Database Operations",
    "ME_READ_S": "Memory Read Cached",
    "ME_READ_L": "Memory Read Uncached",
    "ME_WRITE": "Memory Write",
    "ME_LATENCY": "Memory Latency",
}

# server-client framework emission policies (inspector.py:36-51)
_SERVER_CLIENT_MAPS = {
    "static_web": {
        "keys": ["size", "connections_per_vcpus"],
        "measurements": ["rps", "rps-extrapolated", "throughput",
                         "throughput-extrapolated", "latency"],
    },
    "redis": {
        "keys": ["operation", "pipeline"],
        "measurements": ["rps", "rps-extrapolated", "latency"],
    },
}


def bw_mem_benchmarks(bw: DataFrame) -> DataFrame:
    """bw_mem rows -> benchmark rows (inspector.py:356-371):
    benchmark_id "bw_mem", config {operation, size}, score MB/s."""
    return bw.select(
        "server_id",
        F.lit("bw_mem").alias("benchmark_id"),
        F.to_json(F.struct(
            F.col("operation").alias("operation"),
            F.col("size_mb").alias("size")),
            {"ignoreNullFields": "false"}).alias("config"),
        F.col("mb_per_s").alias("score"),
    )


def geekbench_benchmarks(gb: DataFrame) -> DataFrame:
    """geekbench workload rows -> benchmark rows (inspector.py:404-444):
    benchmark_id "geekbench:<workload slug>", config {"cores":
    single|multi} from the section name."""
    slug = F.regexp_replace(F.lower("workload"), r"\W+", "_")
    cores = F.when(F.col("section") == "Single-Core Performance",
                   "single").otherwise("multi")
    return gb.select(
        "server_id",
        F.concat(F.lit("geekbench:"), slug).alias("benchmark_id"),
        F.to_json(F.struct(cores.alias("cores")),
                  {"ignoreNullFields": "false"}).alias("config"),
        "score",
    )


def passmark_benchmarks(pm: DataFrame) -> DataFrame:
    """passmark metrics -> benchmark rows (inspector.py:446-474): only
    the published PASSMARK_MAPS keys, id = "passmark:<name slug>",
    no config."""
    import re as _re

    bid = F.col("metric")
    for key, name in _PASSMARK_MAPS.items():
        bid = F.when(F.col("metric") == key,
                     "passmark:" + _re.sub(r"\W+", "_", name.lower())
                     ).otherwise(bid)
    return (
        pm.filter(F.col("metric").isin(list(_PASSMARK_MAPS)))
        .select("server_id", bid.alias("benchmark_id"),
                F.lit(None).cast("string").alias("config"),
                F.col("value").alias("score"))
    )


def stressng_benchmarks(sn: DataFrame) -> DataFrame:
    """stressngfull curve -> the stress_ng benchmark family
    (inspector.py:496-576): cpu_all at the fewest/most cores,
    div16 for every row (config {"cores": n}), and the config-less
    best1 (fewest-cores score) / bestn (max score) pair."""
    cfg = F.to_json(F.struct(F.col("cores").alias("cores")),
                    {"ignoreNullFields": "false"})
    div16 = sn.select(
        "server_id", F.lit("stress_ng:div16").alias("benchmark_id"),
        cfg.alias("config"), "score")
    bounds = sn.groupBy("server_id").agg(
        F.min("cores").alias("_min_c"), F.max("cores").alias("_max_c"),
        F.min_by("score", "cores").alias("best1"),
        F.max("score").alias("bestn"),
    )
    cpu_all = sn.join(bounds, "server_id").filter(
        (F.col("cores") == F.col("_min_c"))
        | (F.col("cores") == F.col("_max_c"))
    ).select(
        "server_id", F.lit("stress_ng:cpu_all").alias("benchmark_id"),
        cfg.alias("config"), "score")
    bests = bounds.selectExpr(
        "server_id",
        "stack(2, 'stress_ng:best1', best1, 'stress_ng:bestn', bestn) "
        "AS (benchmark_id, score)",
    ).select("server_id", "benchmark_id",
             F.lit(None).cast("string").alias("config"), "score")
    return div16.unionByName(cpu_all).unionByName(bests)


def server_client_benchmarks(df: DataFrame, framework: str,
                             vcpus: DataFrame | None = None) -> DataFrame:
    """redis / static_web CSV rows -> benchmark rows
    (inspector.py:578-630): per framework key set, keep the row with
    the highest rps (threads/connections collapse), then emit each
    measurement — extrapolated scores scale rps by the client's CPU
    share, throughput multiplies by the parsed size suffix."""
    policy = _SERVER_CLIENT_MAPS[framework]
    keys = policy["keys"]
    if "connections_per_vcpus" in keys:
        if vcpus is None:
            raise ValueError(f"{framework} needs vcpus for "
                             "connections_per_vcpus")
        df = df.join(vcpus.select("server_id", "vcpus"), "server_id")
        df = df.withColumn("connections_per_vcpus",
                           F.col("connections") / F.col("vcpus"))

    # measures exclude any column already serving as a group key
    # (static_web keys on `size`) so the unpack never duplicates names
    measures = [c for c in ("rps", "latency", "size", "server_usr",
                            "server_sys", "client_usr", "client_sys")
                if c not in keys]
    best = df.groupBy("server_id", *keys).agg(
        F.max_by(
            F.struct(*[F.col(c).alias(c) for c in measures]),
            F.struct(F.col("rps")),
        ).alias("r")
    ).select("server_id", *keys, "r.*")

    susr = F.col("server_usr") + F.col("server_sys")
    cusr = F.col("client_usr") + F.col("client_sys")
    extrapolated = F.round(F.col("rps") / susr * (susr + cusr), 2)
    size_bytes = (
        F.regexp_extract("size", r"^([0-9]+)", 1).cast("double")
        * F.when(F.lower(F.col("size")).endswith("k"), 1024)
        .when(F.lower(F.col("size")).endswith("m"), 1024 * 1024)
        .otherwise(1)
    )
    scores = {
        "rps": F.col("rps"),
        "rps-extrapolated": extrapolated,
        "throughput": F.col("rps") * size_bytes,
        "throughput-extrapolated": extrapolated * size_bytes,
        "latency": F.col("latency"),
    }
    # sorted keys: config JSON is a PK component and the reference sorts
    # dict keys so JSON compares as text (table_bases.py:1253-1256)
    cfg = F.to_json(F.struct(*[F.col(k).alias(k) for k in sorted(keys)]),
                    {"ignoreNullFields": "false"})
    out = None
    for m in policy["measurements"]:
        part = best.select(
            "server_id",
            F.lit(f"{framework}:{m}").alias("benchmark_id"),
            cfg.alias("config"),
            scores[m].alias("score"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def inspector_benchmarks(openssl: DataFrame | None = None,
                         membench: DataFrame | None = None,
                         compression: DataFrame | None = None,
                         cache: DataFrame | None = None,
                         llm: DataFrame | None = None,
                         lscpu: DataFrame | None = None,
                         bw_mem: DataFrame | None = None,
                         geekbench: DataFrame | None = None,
                         passmark: DataFrame | None = None,
                         stressng: DataFrame | None = None,
                         redis: DataFrame | None = None,
                         static_web: DataFrame | None = None,
                         vcpus: DataFrame | None = None) -> DataFrame:
    """Union the per-framework readers into ONE benchmark_score-shaped
    frame ``(server_id, benchmark_id, config, score)`` — the relational
    form of the reference's ``inspect_server_benchmarks`` accumulator
    (inspector.py:339-757). Fleet scoring (operators/scores.py) and the
    workload catalog consume this shape directly."""
    frames = []
    if openssl is not None:
        frames.append(openssl.select(
            "server_id", "benchmark_id",
            F.to_json(F.struct(
                F.col("algo").alias("algo"),
                F.col("block_size").alias("block_size")),
                {"ignoreNullFields": "false"}).alias("config"),
            "score"))
    if membench is not None:
        frames.append(membench_benchmarks(membench, cache))
    if compression is not None:
        frames.append(compression)
    if llm is not None:
        frames.append(llm)
    if lscpu is not None:
        frames.append(bogomips_benchmark(lscpu))
    if bw_mem is not None:
        frames.append(bw_mem_benchmarks(bw_mem))
    if geekbench is not None:
        frames.append(geekbench_benchmarks(geekbench))
    if passmark is not None:
        frames.append(passmark_benchmarks(passmark))
    if stressng is not None:
        frames.append(stressng_benchmarks(stressng))
    if redis is not None:
        frames.append(server_client_benchmarks(redis, "redis"))
    if static_web is not None:
        if vcpus is None:
            # the reference logs-and-continues per framework
            # (_log_cannot_load_benchmarks) — a missing lscpu must not
            # abort every OTHER framework's rows
            print("inspector_benchmarks: skipping static_web "
                  "(no vcpus frame for connections_per_vcpus)")
        else:
            frames.append(server_client_benchmarks(
                static_web, "static_web", vcpus=vcpus))
    if not frames:
        raise ValueError("no benchmark frames supplied")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def memory_amount_actual(lstopo: DataFrame | None,
                         lshw: DataFrame | None,
                         dmidecode: DataFrame | None = None) -> DataFrame:
    """The reference's fallback chain lstopo -> lshw -> dmidecode
    (inspector.py:1344-1351) as coalesced outer joins; `dmidecode` is
    the `dmidecode_facts` frame (its memory_amount_mib is the
    Memory-Device byte sum, inspector_helpers.py:164-171)."""
    frames = [
        (df, alias) for df, alias in
        ((lstopo, "_topo"), (lshw, "_lshw"), (dmidecode, "_dmi"))
        if df is not None
    ]
    if not frames:
        # fail with intent (same pattern as inspector_benchmarks), not
        # an opaque AttributeError on out.select below
        raise ValueError(
            "memory_amount_actual needs at least one of lstopo / lshw / "
            "dmidecode")
    out = None
    for df, alias in frames:
        nxt = df.select("server_id",
                        F.col("memory_amount_mib").cast("double").alias(alias))
        out = nxt if out is None else out.join(nxt, "server_id", "full_outer")
    return out.select(
        "server_id",
        F.coalesce(*[a for _, a in frames]).alias("memory_amount_actual"))
