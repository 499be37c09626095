"""P9/F15/F16 text standardizers vs reference behavior
(inspector.py:760-1012, _aws.py:180-255)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sc_crawler_spark.functions import standardize as S
from sc_crawler_spark.sources.inspector import average_time_to_start


def _apply(spark, fn, values, extra=None):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_cpu_model(spark):
    got = _apply(spark, S.standardize_cpu_model, [
        "Intel(R) Xeon(R) Platinum 8175M CPU @ 2.50GHz",
        "AMD EPYC 7571",
        "Intel Xeon Processor (Skylake, IBRS)",
        "EPYC-Milan",
        "Not Specified",
        "AMD EPYC 7R32 48-Core Processor",
    ])
    assert got[0] == "8175M"
    assert got[1] == "7571"
    assert got[3] == "Milan"
    assert got[4] is None
    assert got[5] == "7R32"


def test_cpu_manufacturer(spark):
    got = _apply(spark, S.standardize_manufacturer, [
        "Advanced Micro Devices, Inc.",
        "Intel(R) Corporation",
        "Tesla",
        "QEMU",
        "Ampere(R)",
    ])
    assert got == ["AMD", "Intel", "NVIDIA", None, "Ampere"]


def test_gpu_model(spark):
    got = _apply(spark, S.standardize_gpu_model, [
        "NVIDIA A10G",
        "Tesla T4",
        "nvidia-a100-80gb",
        "A100-SXM4-40GB",
        "H100 80GB HBM3",
        "T4/8",
        "RTX5880",
        "T4g",
        "N/A",
    ])
    assert got == [
        "A10G", "T4", "A100", "A100", "H100", "T4", "RTX 5880", "T4G", None,
    ]


def test_fractional_gpu_count(spark):
    df = spark.createDataFrame(
        [
            ("P4*1/4", 0, 0),
            ("T4/8", 0, 0),
            ("A10*2", 0, 0),
            ("V100", 4, 0),
            (None, 2, 0),
            ("L4", 0, 11444),
            ("*2/4", 0, 0),  # reference quirk: numerator group never binds
        ],
        "model string, count int, mem int",
    )
    got = [
        r["n"] for r in df.select(
            S.fractional_gpu_count(F.col("model"), F.col("count"), F.col("mem"))
            .alias("n")
        ).collect()
    ]
    assert got == [0.25, 0.125, 2.0, 4.0, 2.0, 0.5, 0.25]


def test_annotate_instance_type(spark):
    got = _apply(spark, S.annotate_instance_type, [
        "m5.large",
        "c6gd.xlarge",
        "u-6tb1.112xlarge",
        "weird9.big",
    ])
    assert got[0] == "General purpose Gen5 large"
    assert got[1] == ("Compute optimized [AWS Graviton processors]"
                      " [Instance store volumes] Gen6 xlarge")
    assert got[2] == "High memory Gen1 112xlarge"
    assert got[3] is None  # unknown family -> NULL, not a job failure


def test_average_time_to_start(spark):
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            ("s1", ts(0), ts(30)),
            ("s1", ts(0), ts(40)),
            ("s1", ts(10), ts(5)),   # negative -> excluded
            ("s1", None, ts(5)),     # missing endpoint -> excluded
            ("s2", ts(0), ts(7)),
        ],
        "server_id string, api_start timestamp, machine_start timestamp",
    )
    got = {r["server_id"]: r["average_time_to_start"]
           for r in average_time_to_start(df).collect()}
    assert got == {"s1": 35.0, "s2": 7.0}
