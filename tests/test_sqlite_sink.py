"""SQLite publish sink vs the reference's bulk-upsert + metadata
semantics (insert.py:115-173, cli.py:242-279)."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from sc_crawler_spark.sinks.sqlite import publish_lake, publish_table


def test_publish_and_upsert(spark, tmp_path):
    db = str(tmp_path / "sc-data.db")
    con = sqlite3.connect(db)

    v1 = spark.createDataFrame(
        [("aws", "m5.large", 2, 8192.0), ("aws", "t3.micro", 2, 1024.0)],
        "vendor_id string, server_id string, vcpus int, memory double",
    )
    n = publish_table(con, v1, "server", ["vendor_id", "server_id"])
    assert n == 2

    # second publish: PK conflict updates every non-PK column (K1)
    v2 = spark.createDataFrame(
        [("aws", "m5.large", 4, 16384.0), ("aws", "c5.large", 2, 4096.0)],
        "vendor_id string, server_id string, vcpus int, memory double",
    )
    publish_table(con, v2, "server", ["vendor_id", "server_id"])
    rows = dict(
        (sid, (vc, mem)) for _, sid, vc, mem in
        con.execute("SELECT * FROM server ORDER BY server_id")
    )
    assert rows == {
        "c5.large": (2, 4096.0),
        "m5.large": (4, 16384.0),  # updated, not duplicated
        "t3.micro": (2, 1024.0),   # untouched
    }
    con.close()


def test_publish_lake_metadata_last(spark, tmp_path):
    db = str(tmp_path / "lake.db")
    region = spark.createDataFrame(
        [("aws", "us-east-1", ["use1"])],
        "vendor_id string, region_id string, zones array<string>",
    ).withColumn("zones", F.to_json("zones"))
    counts = publish_lake(
        {"region": (region, ["vendor_id", "region_id"])},
        db, version="1.2.3", extra_metadata={"publisher": "tests"},
    )
    assert counts == {"region": 1}
    con = sqlite3.connect(db)
    meta = dict(con.execute("SELECT key, value FROM _metadata"))
    assert meta["sc_crawler_version"] == "1.2.3"
    assert meta["publisher"] == "tests"
    assert "published_at" in meta
    # JSON-serialized array column round-trips as text
    assert con.execute("SELECT zones FROM region").fetchone()[0] == '["use1"]'
    con.close()
