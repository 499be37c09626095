"""Server-description corpus ingestion (SURVEY.md §2.1 S5/S6, §2.9 F17;
reference description_ingestor.py:21-91 + ServerDescriptionFields
validators at table_bases.py:1133-1240).

The reference downloads a zip of per-server ``descriptions/output.json``
files and validates each through pydantic, dropping failures row-by-row.
Here the landed tree is one ``spark.read`` + ``from_json``, and the
validators are Column predicates that SPLIT the frame into valid/invalid
(error-side output) instead of raising per row — same acceptance set,
job never dies on one bad document (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

DESCRIPTION_SCHEMA = StructType([
    StructField("page", ArrayType(StringType())),
    StructField("description", StringType()),
    StructField("og_description", StringType()),
    StructField("meta_description", StringType()),
    StructField("tagline", StringType()),
    StructField("bullet_points", ArrayType(StringType())),
    StructField("categories", ArrayType(StringType())),
])


def word_count(col: Column) -> Column:
    """len(v.strip().split()) — 0 for blank strings (Python split on a
    blank string yields [], but Spark's split yields [''])."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def read_description_outputs(spark: SparkSession, glob: str) -> DataFrame:
    """S5/S6 — landed ``<vendor>/<api_reference>/descriptions/output.json``
    tree -> one row per server (ids recovered from the path, as the
    reference derives them from the directory layout)."""
    raw = spark.read.text(glob, wholetext=True)
    parts = F.split(F.input_file_name(), "/")
    parsed = raw.select(
        F.element_at(parts, -4).alias("vendor_id"),
        F.element_at(parts, -3).alias("api_reference"),
        F.from_json("value", DESCRIPTION_SCHEMA).alias("d"),
    )
    return parsed.select("vendor_id", "api_reference", "d.*")


# rule name -> failure predicate (true == INVALID), mirroring the pydantic
# validators 1:1 (table_bases.py:1171-1234)
def _failure_rules() -> list[tuple[str, Column]]:
    page_words = F.aggregate(
        F.col("page"), F.lit(0), lambda acc, p: acc + word_count(p)
    )
    return [
        ("page_empty", F.col("page").isNull() | (F.size("page") < 1)),
        ("page_blank_paragraph",
         F.exists(F.col("page"), lambda p: F.trim(p) == "")),
        ("page_too_long", page_words > 500),
        ("description_too_long", word_count(F.col("description")) > 175),
        ("og_description_length",
         ~F.length(F.trim("og_description")).between(175, 225)),
        ("meta_description_length",
         ~F.length(F.trim("meta_description")).between(125, 175)),
        ("tagline_words", ~word_count(F.col("tagline")).between(15, 25)),
        ("bullet_points_count", ~F.size("bullet_points").between(4, 6)),
        ("categories_count", ~F.size("categories").between(1, 3)),
        ("categories_duplicates",
         F.size(F.array_distinct("categories")) != F.size("categories")),
    ]


def with_validation_errors(df: DataFrame) -> DataFrame:
    """F17 — adds ``errors: array<string>`` of failed rule names (empty =
    valid). NULL field values fail their rule (pydantic would reject a
    missing required field too)."""
    errs = [
        F.when(F.coalesce(pred, F.lit(True)), F.lit(name))
        for name, pred in _failure_rules()
    ]
    return df.withColumn(
        "errors", F.filter(F.array(*errs), lambda e: e.isNotNull())
    )


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) — the engine's error-side-output replacement for
    the reference's per-row exception skip (description_ingestor.py:73-86)."""
    flagged = with_validation_errors(df)
    return (
        flagged.filter(F.size("errors") == 0).drop("errors"),
        flagged.filter(F.size("errors") > 0),
    )
