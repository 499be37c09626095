"""The COMPLETE reference pull loop as one integration test:
pull dims -> inventory (two vendors) -> inspect (HW benchmarks +
enrichment) -> score (workload profiles) -> compact -> publish to
SQLite -> stable content hashes. Every stage reads what the previous
one committed — the end-to-end contract a reference user migrating to
this engine relies on."""

from __future__ import annotations

import json
import os
import sqlite3

from pyspark.sql import functions as F

from sc_crawler_spark import cli
from sc_crawler_spark.sinks.snapshot import read_snapshot

from .test_inventory_cli import _instance, _product, _write_bronze


def test_full_pull_loop(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    lake = str(tmp_path / "lake")

    # ---- stage 0: static dims
    cli.cmd_pull(spark, lake)

    # ---- stage 1: inventory — aws (API-shaped) + hcloud (catalog)
    _write_bronze(bronze,
                  [_instance("m1.small", 2, 4096),
                   _instance("m1.large", 8, 16384)],
                  [_product("m1.small", "US East (N. Virginia)", 0.05),
                   _product("m1.large", "US East (N. Virginia)", 0.40)])
    d = os.path.join(bronze, "hcloud")
    os.makedirs(d)
    with open(os.path.join(d, "servers.json"), "w") as fh:
        fh.write(json.dumps({
            "id": 22, "name": "cx22", "cores": 2, "memory": 4.0,
            "disk": 40, "cpu_type": "shared", "architecture": "x86"}))
    with open(os.path.join(d, "regions.json"), "w") as fh:
        fh.write(json.dumps({"region_id": "nbg1", "name": "Nuremberg",
                             "aliases": [], "country_id": "DE",
                             "city": "Nuremberg", "green_energy": True}))
    cli.cmd_inventory(spark, bronze, lake, vendor="aws")
    cli.cmd_inventory(spark, bronze, lake, vendor="hcloud")

    servers = read_snapshot(spark, os.path.join(lake, "server"))
    assert {r["vendor_id"] for r in servers.collect()} == {"aws", "hcloud"}
    assert read_snapshot(
        spark, os.path.join(lake, "server_price")).count() >= 4
    region = read_snapshot(spark, os.path.join(lake, "region"))
    assert region.filter("vendor_id = 'hcloud'").count() == 1

    # ---- stage 2: inspect — benchmarks + HW enrichment for aws
    di = os.path.join(bronze, "inspector", "aws", "m1.small")
    os.makedirs(di)
    with open(os.path.join(di, "lscpu.json"), "w") as fh:
        json.dump({"lscpu": [
            {"field": "CPU(s):", "data": "2"},
            {"field": "Core(s) per socket:", "data": "1"},
            {"field": "Socket(s):", "data": "1"},
            {"field": "Model name:",
             "data": "Intel(R) Xeon(R) Platinum 8375C CPU @ 2.90GHz"},
            {"field": "BogoMIPS:", "data": "5799.87"},
        ]}, fh)
    with open(os.path.join(di, "stressngfull.csv"), "w") as fh:
        fh.write("cores,score\n1,100.0\n2,180.0\n")
    cli.cmd_inspect(spark, bronze, lake, "aws")

    bs = read_snapshot(spark, os.path.join(lake, "benchmark_score"))
    assert bs.filter("benchmark_id = 'stress_ng:best1'").count() == 1
    srv = {r["server_id"]: r for r in read_snapshot(
        spark, os.path.join(lake, "server")).collect()}
    assert srv["m1.small"]["cpu_model"] == "8375C"     # inspected override
    assert srv["m1.small"]["ecpus"] == 1.8
    assert srv["22"]["cpu_model"] is None              # other vendor intact
    assert srv["22"]["name"] == "cx22"

    # ---- stage 3: score — synthetic workload profiles
    cli.cmd_score(spark, lake)
    wp = read_snapshot(spark, os.path.join(lake, "benchmark_score")).filter(
        "benchmark_id LIKE 'workload_profile:%' AND status = 'active'")
    assert wp.count() >= 1
    assert wp.filter("score_breakdown IS NOT NULL").count() == wp.count()

    # ---- stage 4: compact — layout maintenance must not change content
    before = cli.table_digest(spark, lake, "server_price")
    cli.cmd_compact(spark, lake, "server_price")
    assert cli.table_digest(spark, lake, "server_price") == before

    # ---- stage 5: publish — the SQLite artifact a reference user gets
    db = str(tmp_path / "sc-data-all.db")
    cli.cmd_publish(spark, lake, db, version="9.9.9")
    con = sqlite3.connect(db)
    n_srv = con.execute("SELECT COUNT(*) FROM server").fetchone()[0]
    assert n_srv == read_snapshot(
        spark, os.path.join(lake, "server")).count()
    meta = dict(con.execute("SELECT key, value FROM _metadata").fetchall())
    con.close()
    assert meta.get("sc_crawler_version") == "9.9.9"

    # ---- stage 6: repeatability — hashes stable across a no-op re-pull
    h1 = cli.table_digest(spark, lake, "server")
    cli.cmd_inventory(spark, bronze, lake, vendor="hcloud")
    servers2 = read_snapshot(spark, os.path.join(lake, "server"))
    assert servers2.filter(
        (F.col("vendor_id") == "aws") & (F.col("status") == "active")
    ).count() == 2                                     # other vendor unswept
