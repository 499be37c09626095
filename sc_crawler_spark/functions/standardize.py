"""Text standardizers for CPU/GPU/instance metadata (SURVEY.md §2.3 P9,
§2.9 F15-F16).

The reference cleans hardware names row-at-a-time in Python
(inspector.py:760-1012, _aws.py:180-255); here each standardizer is one
native Column expression — ordered prefix strips become an anchored
``regexp_replace`` chain, lookup dicts become CASE chains — so the whole
transform stays inside whole-stage codegen (no Python in the hot path at
100 TB).

Semantics are reproduced faithfully, including reference quirks (e.g. the
fractional-GPU regex whose optional numerator group never participates —
see :func:`fractional_gpu_count`).
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- P9: CPU

_INVALID_MANUFACTURERS = ["(invalid)", "Not Specified", "QEMU", "Google", "Amazon EC2"]

_MANUFACTURER_MAP = {
    "Advanced Micro Devices, Inc.": "AMD",
    "Intel(R) Corporation": "Intel",
    "Nvidia": "NVIDIA",
    "NVIDIA": "NVIDIA",
    "Tesla": "NVIDIA",
    "MICROSOFT CORPORATION": "Microsoft",
    "Alibaba Cloud": "Alibaba",
}

# Ordered prefix list — each applied once, in order (inspector.py:828-884).
_CPU_MODEL_PREFIXES = [
    "Alibaba", "Hygon", "Intel®", "Intel", "INTEL", "AMD", "(R)", "Xeon®",
    "Xeon", "XEON", "EPYC ", "EPYC™ ", "EPYC-", "AWS ", "(R)", "™",
    "Platinum", "PLATINUM", "Gold", "CPU", "Core Processor ", "Processor",
    "(Broadwell, no TSX, IBRS)", "(Ice Lake)", "(Cascadelake)",
    "(Cascade Lake)", "(Skylake)", "(Skylake, IBRS)",
    "(Skylake, IBRS, no TSX)", "(Cooper Lake)", "(Sapphire Rapid)",
    "(Sapphire Rapids)", "(Emerald Rapids)", "(EMR)", "EMR ", "Genoa",
    "Milan", "Rome", "ROME", "Turin-C", "Turin", "Platinum", "Gold",
    "Processor",
]

_CPU_MODEL_SENTINELS = [
    "Not Specified", "NotSpecified", "(invalid)", "GENUINE INTEL(R) 0000",
    "pc-i440fx-9.2",
]


def _strip_prefixes(col: Column, prefixes: list[str]) -> Column:
    """Apply the reference's ordered prefix-strip loop: for each prefix in
    order, if the value starts with it, drop it and left-trim."""
    return reduce(
        lambda c, p: F.regexp_replace(c, "^" + re.escape(p) + r"\s*", ""),
        prefixes,
        col,
    )


def standardize_manufacturer(col: Column) -> Column:
    """P9 — `_standardize_manufacturer` (inspector.py:792-817): short-name
    mapping, invalid-value drop, copyright-mark strip."""
    mapped = col
    for k, v in _MANUFACTURER_MAP.items():
        mapped = F.when(col == k, F.lit(v)).otherwise(mapped)
    cleaned = F.trim(F.regexp_replace(mapped, r"(\([rRcC]\)|®|©)", ""))
    return F.when(col.isin(_INVALID_MANUFACTURERS), F.lit(None)).otherwise(
        F.when(col.isin(list(_MANUFACTURER_MAP)), mapped).otherwise(cleaned)
    )


def standardize_cpu_model(col: Column) -> Column:
    """P9 — `_standardize_cpu_model` (inspector.py:828-904): sentinel
    values to NULL, ordered prefix strips, clock/core-count suffix drops,
    slash/unicode-paren truncation."""
    m = _strip_prefixes(F.trim(col), _CPU_MODEL_PREFIXES)
    m = F.regexp_replace(m, r"( CPU)? ?@ \d+\.\d+GHz$", "")
    m = F.regexp_replace(m, r"( \d+-Core)?( Processor)?$", "")
    m = F.regexp_replace(m, r"/.*$", "")
    m = F.regexp_replace(m, r"（.*$", "")
    # special cases resolved to product family (inspector.py:896-901)
    m = (
        F.when(F.trim(col) == "Intel Core Processor (Haswell, no TSX)", F.lit("Haswell"))
        .when(F.trim(col) == "EPYC-Genoa", F.lit("Genoa"))
        .when(F.trim(col) == "EPYC-Milan", F.lit("Milan"))
        .otherwise(m)
    )
    return F.when(
        F.trim(col).isin(_CPU_MODEL_SENTINELS) | (F.trim(m) == ""), F.lit(None)
    ).otherwise(m)


# --------------------------------------------------------------- P9: GPU

_GPU_MODEL_PREFIXES = [
    "NVIDIA ", "Tesla ", "Radeon Pro ", "Nvidia Tesla ", "Gaudi ",
    "Quadro ", "GeeForce ", "AMD ",
]

_GPU_RENAMES = {
    "nvidia-a100-80gb": "A100-SXM4-80GB",
    "nvidia-b200": "B200",
    "nvidia-h200-141gb": "H200",
    "nvidia-rtx-pro-6000": "RTX Pro 6000",
    "nvidia-gb200": "GB200",
}

# These return before the suffix subs run (inspector.py:969-976).
_GPU_EARLY_RETURNS = {
    "RTX 5880 Ada": "RTX 5880",
    "RTX5880": "RTX 5880",
    "RTX6000": "RTX 6000",
    "RTX PRO Server 6000": "RTX Pro 6000",
    "T4g": "T4G",
}


def standardize_gpu_model(col: Column) -> Column:
    """P9 — `_standardize_gpu_model` (inspector.py:950-997), model-only
    path (the per-server p4de override needs server context and lives in
    the enrichment join, not the scalar)."""
    t = F.trim(col)
    stripped = _strip_prefixes(t, _GPU_MODEL_PREFIXES)
    for k, v in _GPU_RENAMES.items():
        stripped = F.when(stripped == k, F.lit(v)).otherwise(stripped)
    after = F.when(
        stripped.isin(list(_GPU_EARLY_RETURNS)),
        reduce(
            lambda c, kv: F.when(stripped == kv[0], F.lit(kv[1])).otherwise(c),
            _GPU_EARLY_RETURNS.items(),
            F.lit(None).cast("string"),
        ),
    )
    m = stripped
    for pat in [r" NVL$", r"-SXM[0-9]-[0-9]*GB$", r" [0-9]*GB (HBM3|PCIe)$",
                r"( |-)[0-9]*GB?$", r"-PCI(e|E)$", r"-virt1$",
                r"(\*1)?/\d+$", r"\*1$"]:
        m = F.regexp_replace(m, pat, "")
    out = F.coalesce(after, m)
    return F.when(t.isin("", "0", "NULL", "NA", "N/A"), F.lit(None)).otherwise(out)


def fractional_gpu_count(model: Column, count: Column,
                         memory: Column | None = None) -> Column:
    """F16 — `_standardize_gpu_count` (inspector.py:907-947): GPU count
    from model-name suffixes — ``.../N`` -> 1/N, ``...*N`` -> N, else the
    reported count. The reference's optional numerator group ``(\\*(\\d+))?``
    never participates (the greedy ``.*`` consumes it), so ``*2/4`` is
    0.25, not 0.5 — reproduced as-is for parity. The L4 memory-derived
    branch applies when count is absent/zero (AWS g6f/gr6f)."""
    m = F.trim(model)
    denom = F.regexp_extract(m, r"/(\d+)$", 1)
    mult = F.regexp_extract(m, r"\*(\d+)$", 1)
    base = F.coalesce(count.cast("double"), F.lit(0.0))
    result = (
        F.when((m == "L4") & (base == 0) & (
            F.coalesce(memory, F.lit(0)) > 0 if memory is not None else F.lit(False)
        ), F.round(F.coalesce(memory, F.lit(0)) / F.lit(22888.0), 4))
        .when(denom != "", F.round(F.lit(1.0) / denom.cast("double"), 4))
        .when(mult != "", mult.cast("double"))
        .otherwise(base)
    )
    return F.when(model.isNull() | (m == ""), base).otherwise(result)


# ------------------------------------------- F15: instance-type description

_INSTANCE_FAMILIES = {
    "a": "AWS Graviton", "c": "Compute optimized", "d": "Dense storage",
    "dl": "Deep Learning", "f": "FPGA", "g": "Graphics intensive",
    "gr": "Graphics intensive with a one to eight ratio of vCPU to memory",
    "h": "Cost-effective storage optimized with HDD",
    "hpc": "High performance computing", "i": "Storage optimized",
    "im": "Storage optimized with a one to four ratio of vCPU to memory",
    "is": "Storage optimized with a one to six ratio of vCPU to memory",
    "inf": "AWS Inferentia", "m": "General purpose", "mac": "macOS",
    "p": "GPU accelerated", "r": "Memory optimized",
    "t": "Burstable performance", "trn": "AWS Trainium", "u": "High memory",
    "vt": "Video transcoding", "x": "Memory intensive", "z": "High frequency",
}

_INSTANCE_SUFFIXES = [  # ordered (dict order matters for concatenation)
    ("a", "AMD processors"),
    ("g", "AWS Graviton processors"),
    ("i", "Intel processors"),
    ("d", "Instance store volumes"),
    ("n", "Network and EBS optimized"),
    ("e", "Extra storage or memory"),
    ("z", "High performance"),
    ("q", "Qualcomm inference accelerators"),
    ("flex", "Flex instance"),
]


def annotate_instance_type(col: Column) -> Column:
    """F15 — `_annotate_instance_type` (_aws.py:222-255): decode
    ``<family><gen><extras>.<size>`` into a human description via the
    published family/suffix tables. Unknown families yield NULL (the
    reference raises; a Spark transform flags instead of failing the job).
    """
    kind = F.split(col, r"\.")[0]
    kind = F.regexp_replace(kind, r"^u-([0-9]*)tb", "u")
    kind = F.split(kind, "-")[0]
    family = F.split(kind, "[0-9]")[0]
    extras = F.coalesce(F.split(kind, "[0-9]")[1], F.lit(""))
    generation = F.regexp_extract(kind, "[0-9]", 0)
    size = F.split(col, r"\.")[1]

    # Map-literal lookup + concat of independent optional segments.
    # (A when-chain that re-references the running text on both branches
    # doubles the expression tree per suffix — 2^9 nodes — and OOMs
    # Catalyst; concat of empty-or-segment pieces is linear.)
    fam_map = F.create_map(
        *[F.lit(x) for kv in _INSTANCE_FAMILIES.items() for x in kv]
    )
    base = fam_map[family]
    segs = [
        F.when(extras.contains(k), F.lit(f" [{v}]")).otherwise(F.lit(""))
        for k, v in _INSTANCE_SUFFIXES
    ]
    gen = F.when(
        generation != "", F.concat(F.lit(" Gen"), generation)
    ).otherwise(F.lit(""))
    return F.when(base.isNotNull(), F.concat(base, *segs, gen, F.lit(" "), size))
