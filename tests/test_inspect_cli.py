"""`inspect` command e2e: bronze inspector tree -> benchmark_score rows
+ server hardware enrichment (reference inspector.py:339-757,
1222-1453)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sc_crawler_spark import cli
from sc_crawler_spark.sinks.snapshot import read_snapshot, write_snapshot


def _write_inspector_bronze(root: str) -> None:
    d = os.path.join(root, "inspector", "aws", "m1.small")
    os.makedirs(d)
    with open(os.path.join(d, "lscpu.json"), "w") as fh:
        json.dump({"lscpu": [
            {"field": "CPU(s):", "data": "4"},
            {"field": "Core(s) per socket:", "data": "2"},
            {"field": "Socket(s):", "data": "1"},
            {"field": "Model name:",
             "data": "Intel(R) Xeon(R) Platinum 8375C CPU @ 2.90GHz"},
            {"field": "BogoMIPS:", "data": "5799.87"},
            {"field": "L3 cache:", "data": "16777216"},
        ]}, fh)
    with open(os.path.join(d, "stressngfull.csv"), "w") as fh:
        fh.write("cores,score\n1,100.0\n2,180.0\n4,260.0\n")
    with open(os.path.join(d, "openssl.json"), "w") as fh:
        fh.write("\n".join(json.dumps(w) for w in [
            {"algo": "sha256", "block_size": 16384, "speed": 2202661.19},
        ]))
    with open(os.path.join(d, "virtualization.json"), "w") as fh:
        json.dump({"kvm": True}, fh)
    with open(os.path.join(d, "dmidecode.json"), "w") as fh:
        json.dump([
            {"name": "Memory Device",
             "props": {"Size": 8589934592, "Type": "DDR5",
                       "Speed": 4800000000}},
        ], fh)
    with open(os.path.join(d, "lsblk.json"), "w") as fh:
        # aws boots from network -> nvme0 skipped, nvme1 local
        json.dump({"blockdevices": [
            {"name": "nvme0n1", "size": 100 * 1000**3,
             "subsystems": "block:nvme:pci"},
            {"name": "nvme1n1", "size": 475 * 1000**3,
             "subsystems": "block:nvme:pci"},
        ]}, fh)


def test_inspect_lands_scores_and_enriches_servers(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    lake = str(tmp_path / "lake")
    _write_inspector_bronze(bronze)

    # seed a server table with vendor-declared values to be overridden
    servers = spark.createDataFrame(
        [("aws", "m1.small", "m1.small", "m1.small", "m1.small",
          "shared", "x86_64", 4, 4, "vendor-model", 7000, None, "active")],
        "vendor_id string, server_id string, name string, "
        "api_reference string, display_name string, cpu_allocation string, "
        "cpu_architecture string, vcpus int, cpu_cores int, "
        "cpu_model string, memory_amount long, memory_amount_actual long, "
        "status string",
    ).withColumn("observed_at", F.current_timestamp())
    write_snapshot(spark, servers, os.path.join(lake, "server"))

    cli.cmd_inspect(spark, bronze, lake, "aws")

    scores = read_snapshot(spark, os.path.join(lake, "server")).collect()
    srv = {r["server_id"]: r for r in scores}["m1.small"]
    assert srv["cpu_cores"] == 2                 # lscpu overrides vendor
    assert srv["cpu_model"] == "8375C"           # standardized
    assert srv["hw_virt"] is True
    assert srv["cpu_l3_cache_total"] == 16384    # 16 MiB in KiB
    assert srv["memory_generation"] == "DDR5"
    assert srv["memory_amount_actual"] == 8192   # dmidecode byte sum
    assert srv["memory_amount"] == 7000          # vendor value kept
    # vendor-aware lsblk discovery: boot nvme0 skipped, nvme1 lands
    assert srv["storage_type"] == "nvme ssd"
    assert srv["storage_size"] == 475
    assert [d["size"] for d in srv["storages"]] == [475]

    bs = read_snapshot(spark, os.path.join(lake, "benchmark_score"))
    rows = {(r["benchmark_id"], r["config"]): r for r in bs.collect()}
    assert all(r["vendor_id"] == "aws" for r in rows.values())
    assert all(r["status"] == "active" for r in rows.values())
    # bogomips config defaults to the HashableDict '{}' PK convention
    assert rows[("bogomips", "{}")]["score"] == 5800.0
    assert rows[("openssl", '{"algo":"sha256","block_size":16384}')][
        "score"] == 2202661.19
    assert ("stress_ng:best1", "{}") in rows
    assert rows[("stress_ng:div16", '{"cores":4}')]["score"] == 260.0

    # idempotent re-run: same PKs merge, row count stable
    n = bs.count()
    cli.cmd_inspect(spark, bronze, lake, "aws")
    assert read_snapshot(
        spark, os.path.join(lake, "benchmark_score")).count() == n

    # score: synthetic workload_profile rows from the landed scores
    # (single server -> it IS the fleet median; stress_ng components
    # score 1.0, the rest are ignored-missing)
    cli.cmd_score(spark, lake)
    wp = {r["benchmark_id"]: r for r in read_snapshot(
        spark, os.path.join(lake, "benchmark_score")).filter(
        "benchmark_id LIKE 'workload_profile:%'").collect()}
    comp = wp["workload_profile:compute"]
    assert comp["status"] == "active"
    assert comp["score"] == 1.0
    assert "Partial coverage" in comp["note"]
    assert '"aggregation":"weighted_geometric_mean"' in \
        comp["score_breakdown"]
    # re-score: idempotent, previous rows replaced not duplicated
    n_wp = len(wp)
    cli.cmd_score(spark, lake)
    again = read_snapshot(
        spark, os.path.join(lake, "benchmark_score")).filter(
        "benchmark_id LIKE 'workload_profile:%' AND status = 'active'")
    assert again.count() == n_wp
