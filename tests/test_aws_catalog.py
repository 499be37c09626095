"""RDS/EC2 catalog assembly operators (SURVEY.md §2.4 J2/J7, §2.5 A6/A7,
§2.6 W3) on reference-shaped fixtures (mock-payload style, mirroring
tests/test_databases.py in /root/reference)."""

from __future__ import annotations

from sc_crawler_spark.sources import aws


def test_server_price_zone_fanout(spark):
    """J2 — product x server x region join, then one row per zone
    (_aws.py:1006-1032)."""
    products = spark.createDataFrame(
        [
            ("m5.large", "US East (N. Virginia)", "Linux", 0.096),
            ("m5.large", "EU (Ireland)", "Linux", 0.107),
            ("unknown.type", "EU (Ireland)", "Linux", 1.0),  # not in catalog
        ],
        "instance_type string, location string, operating_system string, price double",
    )
    servers = spark.createDataFrame(
        [("aws", "m5.large")], "vendor_id string, server_id string"
    )
    regions = spark.createDataFrame(
        [
            ("us-east-1", "US East (N. Virginia)", ["Virginia"]),
            ("eu-west-1", "EU (Ireland)", None),
        ],
        "region_id string, name string, aliases array<string>",
    )
    zones = spark.createDataFrame(
        [
            ("us-east-1", ["use1-az1", "use1-az2", "use1-az3"]),
            ("eu-west-1", ["euw1-az1"]),
        ],
        "region_id string, zones array<string>",
    )
    out = aws.assemble_server_prices(products, servers, regions, zones)
    rows = sorted((r["region_id"], r["zone_id"], r["price"]) for r in out.collect())
    assert rows == [
        ("eu-west-1", "euw1-az1", 0.107),
        ("us-east-1", "use1-az1", 0.096),
        ("us-east-1", "use1-az2", 0.096),
        ("us-east-1", "use1-az3", 0.096),
    ]
    assert out.columns[:4] == ["vendor_id", "region_id", "zone_id", "server_id"]


def test_region_alias_probe(spark):
    """J1/J2 — region matched through its alias list, not just its name."""
    products = spark.createDataFrame(
        [("m5.large", "Virginia", "Linux", 0.096)],
        "instance_type string, location string, operating_system string, price double",
    )
    servers = spark.createDataFrame(
        [("aws", "m5.large")], "vendor_id string, server_id string"
    )
    regions = spark.createDataFrame(
        [("us-east-1", "US East (N. Virginia)", ["Virginia"])],
        "region_id string, name string, aliases array<string>",
    )
    zones = spark.createDataFrame(
        [("us-east-1", ["use1-az1"])], "region_id string, zones array<string>"
    )
    out = aws.assemble_server_prices(products, servers, regions, zones).collect()
    assert len(out) == 1 and out[0]["region_id"] == "us-east-1"


def test_database_server_sku_match(spark):
    """J7 — db.m5.large -> m5.large prefix-strip join (_aws.py:1563-1570)."""
    dbs = spark.createDataFrame(
        [("aws", "db.m5.large"), ("aws", "db.r6g.xlarge"), ("aws", "db.serverless")],
        "vendor_id string, database_id string",
    )
    servers = spark.createDataFrame(
        [("m5.large",), ("r6g.xlarge",)], "server_id string"
    )
    out = {r["database_id"]: r["server_id"]
           for r in aws.match_database_servers(dbs, servers).collect()}
    assert out == {
        "db.m5.large": "m5.large",
        "db.r6g.xlarge": "r6g.xlarge",
        "db.serverless": None,  # left join keeps unmatched SKUs
    }


def test_first_engine_version_filter(spark):
    """W3 — all rows at the first EngineVersion survive (_aws.py:1368-1375)."""
    opts = spark.createDataFrame(
        [
            ("mysql", "8.0.28", "db.m5.large"),
            ("mysql", "8.0.28", "db.m5.xlarge"),
            ("mysql", "8.0.35", "db.m5.large"),
            ("postgres", "15.2", "db.r6g.large"),
        ],
        "engine string, engine_version string, instance string",
    )
    out = aws.first_engine_version_options(opts).collect()
    got = sorted((r["engine"], r["engine_version"], r["instance"]) for r in out)
    assert got == [
        ("mysql", "8.0.28", "db.m5.large"),
        ("mysql", "8.0.28", "db.m5.xlarge"),
        ("postgres", "15.2", "db.r6g.large"),
    ]


def test_merge_database_catalog_rows(spark):
    """A6 — union+sort versions, OR the flags, max backup days
    (vendor_helpers.py:114-135)."""
    cat = spark.createDataFrame(
        [
            ("aws", "db1", "mysql", ["8.0", "5.7"], False, True, 7),
            ("aws", "db1", "mysql", ["8.0", "8.1"], True, False, 35),
            ("aws", "db2", "postgres", ["15"], False, False, 0),
        ],
        "vendor_id string, database_id string, engine string, "
        "engine_versions array<string>, multi_az boolean, "
        "auto_minor_version_upgrade boolean, continuous_backup_days int",
    )
    out = {r["database_id"]: r
           for r in aws.merge_database_catalog_rows(cat).collect()}
    assert out["db1"]["engine_versions"] == ["5.7", "8.0", "8.1"]
    assert out["db1"]["multi_az"] is True
    assert out["db1"]["auto_minor_version_upgrade"] is True
    assert out["db1"]["continuous_backup_days"] == 35
    assert out["db2"]["engine_versions"] == ["15"]
    assert out["db2"]["multi_az"] is False


def test_storage_option_bounds(spark):
    """A7 — fold orderable options into per-type bounds
    (_aws.py:1470-1510, 1596-1601)."""
    opts = spark.createDataFrame(
        [
            ("aws", "gp3", 20, 1000, 16000, 1000, False),
            ("aws", "gp3", 100, 16384, 12000, 500, True),
            ("aws", "io1", 4, 1024, 64000, 4000, True),
        ],
        "vendor_id string, storage_type string, min_size int, max_size int, "
        "max_iops int, max_throughput int, multi_az boolean",
    )
    out = {r["storage_type"]: r for r in aws.storage_option_bounds(opts).collect()}
    assert (out["gp3"]["min_size"], out["gp3"]["max_size"]) == (20, 16384)
    assert out["gp3"]["max_iops"] == 16000
    assert out["gp3"]["multi_az"] is True
    assert out["io1"]["min_size"] == 4
