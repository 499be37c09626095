"""ANALYZE-style table profiling: per-column null counts, exact
distinct counts, and numeric min/max — the stats pass every warehouse
runs before planning and every data-quality gate runs after landing.

One aggregation job over the table: each column contributes a struct of
aggregates to a single-row frame, exploded back to one row per column.
Multiple COUNT(DISTINCT)s compile to Spark's Expand-based multi-distinct
plan (one scan; cost grows with column count, not with extra passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import dround

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float")


def profile_table(df: DataFrame) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_num, max_num) per column;
    min/max are NULL for non-numeric columns (their ordering is
    type-bound; casting through strings is not cross-engine-stable)."""
    structs = []
    for c, t in df.dtypes:
        numeric = t in _NUMERIC or t.startswith("decimal")
        mn = (dround(F.min(c).cast("double"), 4) if numeric
              else F.lit(None).cast("double"))
        mx = (dround(F.max(c).cast("double"), 4) if numeric
              else F.lit(None).cast("double"))
        structs.append(F.struct(
            F.lit(c).alias("col_name"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
            F.countDistinct(F.col(c)).alias("n_distinct"),
            mn.alias("min_num"),
            mx.alias("max_num"),
        ).alias(f"_{c}"))
    one = df.agg(*structs)
    return one.select(
        F.explode(F.array(*[F.col(f"_{c}") for c, _ in df.dtypes]))
        .alias("s")
    ).select("s.*")
