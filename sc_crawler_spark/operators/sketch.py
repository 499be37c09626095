"""Count-Min sketch primitives (beyond reference — the mergeable
point-query counter the approx tier's HLL/GK sketches don't cover).

The sketch is a d x w counter table: every key increments one cell per
hash row, and a key's count estimate is the MIN over its d cells —
never an underestimate, overestimate bounded by ~e*N/w per row w.h.p.
The table is a commutative monoid under cell-wise addition, which is
what makes it streamable: per-batch partials folded in any arrival
order equal the one-shot sketch (the incremental_daily_rollup
doctrine), and two corpora's sketches merge without re-scanning
either. Geometry is shared by the batch query
(queries/extra.py approx_heavy_hitters) and the streaming fold
(streaming/pipeline.py streaming_cms_sketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 1024


def cms_probes(key: Column) -> Column:
    """The d (row, cell) probe coordinates of a key: xxhash64 seeded
    by the row index, modulo the row width."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(CMS_D - 1)),
        lambda j: F.struct(
            j.alias("row"),
            F.pmod(F.xxhash64(j, key), F.lit(CMS_W)).alias("cell")))


def cms_partial(df: DataFrame, key_col: str) -> DataFrame:
    """The CMS table of a frame: one explode + one partial-aggregable
    groupBy down to at most d*w cells (row, cell, cnt)."""
    return (df.select(F.explode(cms_probes(F.col(key_col))).alias("p"))
            .groupBy(F.col("p.row").alias("row"),
                     F.col("p.cell").alias("cell"))
            .agg(F.count("*").alias("cnt")))
