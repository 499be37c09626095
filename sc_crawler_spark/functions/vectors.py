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
    """Index-fold inner product: acc + a[i]*b[i], left to right.

    Same arithmetic sequence as the zip_with form (and DuckDB's
    list_inner_product), but without materializing the zipped product
    array per pair — in the brute-force top-k inner loop (|q| x |corpus|
    pairs) the elementwise array allocation was ~half the query time.
    """
    return F.aggregate(
        F.sequence(F.lit(0), F.size(a) - 1),
        F.lit(0.0),
        lambda acc, i: acc + a[i] * b[i],
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
