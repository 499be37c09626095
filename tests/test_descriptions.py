"""Server-description ingestion + F17 validators vs the reference's
pydantic acceptance set (table_bases.py:1171-1234)."""

from __future__ import annotations

import json

import pytest

from sc_crawler_spark.sources import descriptions as D

GOOD = {
    "page": ["A solid general purpose server.", "Second paragraph."],
    "description": "Dense technical description of the machine.",
    "og_description": "x" * 200,
    "meta_description": "y" * 150,
    "tagline": " ".join(["word"] * 20),
    "bullet_points": ["a", "b", "c", "d"],
    "categories": ["general_purpose"],
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("descriptions")
    cases = {
        ("aws", "m5.large"): GOOD,
        ("aws", "t3.micro"): {**GOOD, "tagline": "too short"},
        ("gcp", "n2-standard-4"): {
            **GOOD,
            "bullet_points": ["a"],
            "categories": ["x", "x"],
        },
    }
    for (vendor, ref), payload in cases.items():
        d = root / vendor / ref / "descriptions"
        d.mkdir(parents=True)
        (d / "output.json").write_text(json.dumps(payload))
    return str(root)


def test_read_and_split(spark, corpus):
    df = D.read_description_outputs(spark, f"{corpus}/*/*/descriptions/output.json")
    assert df.count() == 3
    valid, invalid = D.split_valid(df)
    v = valid.collect()
    assert [(r["vendor_id"], r["api_reference"]) for r in v] == [("aws", "m5.large")]
    errs = {r["api_reference"]: set(r["errors"]) for r in invalid.collect()}
    assert errs["t3.micro"] == {"tagline_words"}
    assert errs["n2-standard-4"] == {"bullet_points_count", "categories_duplicates"}


def test_boundary_acceptance(spark):
    """Boundary values accepted exactly as pydantic does (175/225 chars,
    15/25 words, 4/6 bullets, 500 page words)."""
    rows = [
        {**GOOD, "og_description": "x" * 175},
        {**GOOD, "og_description": "x" * 225},
        {**GOOD, "tagline": " ".join(["w"] * 15)},
        {**GOOD, "tagline": " ".join(["w"] * 25)},
        {**GOOD, "page": [" ".join(["w"] * 500)]},
        {**GOOD, "bullet_points": ["a", "b", "c", "d", "e", "f"]},
    ]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in D.DESCRIPTION_SCHEMA.fields) for r in rows],
        D.DESCRIPTION_SCHEMA,
    )
    flagged = D.with_validation_errors(df)
    assert all(r["errors"] == [] for r in flagged.collect())


def test_boundary_rejection(spark):
    rows = [
        ({**GOOD, "og_description": "x" * 174}, "og_description_length"),
        ({**GOOD, "og_description": "x" * 226}, "og_description_length"),
        ({**GOOD, "meta_description": "y" * 124}, "meta_description_length"),
        ({**GOOD, "page": [" ".join(["w"] * 501)]}, "page_too_long"),
        ({**GOOD, "page": ["ok", "  "]}, "page_blank_paragraph"),
        ({**GOOD, "page": []}, "page_empty"),
        ({**GOOD, "description": " ".join(["w"] * 176)}, "description_too_long"),
        ({**GOOD, "categories": []}, "categories_count"),
    ]
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in D.DESCRIPTION_SCHEMA.fields) for r, _ in rows],
        D.DESCRIPTION_SCHEMA,
    )
    got = [set(r["errors"]) for r in D.with_validation_errors(df).collect()]
    for (_, want), errs in zip(rows, got):
        assert want in errs, f"expected {want} in {errs}"
