"""Skew mitigation for large joins (SURVEY.md §7 scale work; no
reference analog — the reference is single-node).

AQE's skew-join split handles most runtime skew; this operator is for
the planned-skew case AQE can't fix: a shuffle join where a handful of
hot keys dominate (e.g. one vendor is 90% of ``server_price``) and the
dim side is too big to broadcast.

``salted_join`` spreads each hot key over ``n_salts`` shuffle partitions
by appending a deterministic salt to the fact side and replicating the
dim side once per salt value. Deterministic (hash-based, not rand()):
replays and retries produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, keys: list[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with key salting: fact rows get salt =
    xxhash64(whole row) % n_salts (uniform, deterministic); dim rows are
    replicated across all salts (dim grows n_salts-fold — use only when
    dim << fact and broadcast is impossible).

    Result equals ``fact.join(dim, keys, how)`` for inner/left joins.
    """
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [*keys, "_salt"], how).drop("_salt")
