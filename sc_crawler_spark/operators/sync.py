"""Hash-diff sync (SURVEY.md §2.4 J6, §2.10 T3; reference cli.py:373-597).

Classify rows between a source and target snapshot of the same table:

- ``new``     — PK in source, not in target (left anti)
- ``update``  — PK in both, content hash differs (inner + !=)
- ``deleted`` — PK in target, not in source (left anti, status flipped
  to ``inactive`` with a fresh ``observed_at`` — cli.py:529-536)

Scale notes: both sides hash map-side (no shuffle for the hash), then a
single hash-partition join on the PK; at 100 TB the PK join benefits from
both tables being bucketed on the PK — the hash column keeps the shuffled
payload to (pks, hash) until the final re-fetch of changed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import row_hash


def with_row_hash(df: DataFrame, pks: list[str],
                  ignored: tuple[str, ...] = ("observed_at",)) -> DataFrame:
    """Add the canonical content hash over non-PK, non-ignored columns
    (table_bases.py:169-216 semantics)."""
    non_pk = [c for c in df.columns if c not in pks]
    return df.withColumn("row_sha", row_hash(non_pk, ignored=ignored))


def hash_diff(source: DataFrame, target: DataFrame, pks: list[str],
              ignored: tuple[str, ...] = ("observed_at",)) -> DataFrame:
    """Return source/target rows classified with an ``action`` column
    (new | update | deleted). Projection keeps (pks, action)."""
    # Each side feeds two joins (anti + inner or anti); cache the narrow
    # (pks, hash) projection so the scan+hash map stage runs once per side.
    # The projection is ~50 B/row regardless of table width — it spills
    # cleanly at scale and beats re-reading the wide table.
    s = with_row_hash(source, pks, ignored).select(*pks, "row_sha").cache()
    t = with_row_hash(target, pks, ignored).select(*pks, "row_sha").cache()

    new = s.join(t, pks, "left_anti").select(*pks).withColumn("action", F.lit("new"))
    updated = (
        s.alias("s")
        .join(t.alias("t"), pks, "inner")
        .filter(F.col("s.row_sha") != F.col("t.row_sha"))
        .select(*pks)
        .withColumn("action", F.lit("update"))
    )
    deleted = t.join(s, pks, "left_anti").select(*pks).withColumn("action", F.lit("deleted"))
    return new.unionByName(updated).unionByName(deleted)


def sync_stats(diff: DataFrame) -> DataFrame:
    """Counts per action (reference's sync report, cli.py:540-552)."""
    return diff.groupBy("action").count()
