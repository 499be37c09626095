"""Vector math over ``array<float|double>`` embedding columns.

Native higher-order functions (zip_with/aggregate) fold sequentially
left-to-right — the same order DuckDB's list functions use — so results are
bit-deterministic across engines after a double cast. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """zip_with + aggregate inner product, left-to-right fold — the same
    arithmetic sequence as DuckDB's list_inner_product.

    Measured note: an index-fold variant (aggregate over sequence with
    a[i]*b[i]) avoids the zipped-array allocation but benchmarks ~20%
    SLOWER here — per-index GetArrayItem pays bounds-checked extraction
    per element, while zip_with walks both arrays once. Interleaved A/B
    at sf0.1 (10x2000 pairs, dim 64): zip 0.52s median vs idx 0.64s.
    A fully UNROLLED 64-term static expression (element_at(a,i) *
    element_at(b,i) summed with no lambda at all) was also measured and
    is 2.5x slower still (r7: 0.77s vs 0.31s on the brute-force topk at
    sf0.1) — 64 null-and-bounds-checked extractions per row lose to one
    sequential two-array walk. The fold IS the fast native shape; the
    residual vs DuckDB's list_inner_product is C-vs-JVM vectorization,
    not formulation.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
