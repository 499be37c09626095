"""Full `inventory` pull: bronze JSON tree -> silver lake -> re-pull
lifecycle (T1) -> publish, mirroring the reference's per-vendor pull
(cli.py:868-906)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sc_crawler_spark import cli
from sc_crawler_spark.sinks.snapshot import read_snapshot


def _instance(name, vcpus, mib):
    return json.dumps({
        "InstanceType": name,
        "BurstablePerformanceSupported": False,
        "VCpuInfo": {"DefaultVCpus": vcpus, "DefaultCores": vcpus // 2},
        "ProcessorInfo": {"SupportedArchitectures": ["x86_64"],
                          "SustainedClockSpeedInGhz": 3.0,
                          "Manufacturer": "Intel"},
        "MemoryInfo": {"SizeInMiB": mib},
        "Hypervisor": "nitro",
    })


def _product(itype, location, price):
    terms = {"t1": {"priceDimensions": {
        "d1": {"pricePerUnit": {"USD": str(price)},
               "beginRange": "0", "endRange": "Inf", "unit": "Hrs"}}}}
    return json.dumps({
        "instance_type": itype, "location": location,
        "operating_system": "Linux", "terms": json.dumps(terms),
    })


def _write_bronze(root, instances, products):
    d = os.path.join(root, "aws")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "instance_types.json"), "w") as fh:
        fh.write("\n".join(instances))
    with open(os.path.join(d, "products.json"), "w") as fh:
        fh.write("\n".join(products))
    with open(os.path.join(d, "regions.json"), "w") as fh:
        fh.write(json.dumps({"region_id": "us-east-1",
                             "name": "US East (N. Virginia)",
                             "aliases": ["Virginia"]}))
    with open(os.path.join(d, "zones.json"), "w") as fh:
        fh.write(json.dumps({"region_id": "us-east-1",
                             "zones": ["use1-az1", "use1-az2"]}))


def test_inventory_pull_and_repull(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    lake = str(tmp_path / "lake")
    _write_bronze(
        bronze,
        [_instance("m5.large", 2, 8192), _instance("c5.large", 2, 4096)],
        [_product("m5.large", "US East (N. Virginia)", 0.096),
         _product("c5.large", "Virginia", 0.085),       # via region alias
         _product("unknown.x", "Virginia", 1.0)],       # not in catalog
    )
    cli.cmd_inventory(spark, bronze, lake)

    servers = read_snapshot(spark, os.path.join(lake, "server"))
    assert servers.count() == 2
    assert set(servers.select("status").distinct().toPandas()["status"]) == {"active"}

    prices = read_snapshot(spark, os.path.join(lake, "server_price"))
    # 2 catalog servers x 2 zones (J2 fan-out); unknown SKU dropped
    assert prices.count() == 4
    got = {(r["server_id"], r["zone_id"]): r["price"] for r in prices.collect()}
    assert got[("c5.large", "use1-az2")] == 0.085
    assert all(r["status"] == "active" for r in prices.collect())

    # ---- re-pull with c5.large gone: T1 flips it inactive, m5 updated
    _write_bronze(
        bronze,
        [_instance("m5.large", 2, 16384)],
        [_product("m5.large", "US East (N. Virginia)", 0.099)],
    )
    cli.cmd_inventory(spark, bronze, lake)
    servers = read_snapshot(spark, os.path.join(lake, "server"))
    by_id = {r["server_id"]: r for r in servers.collect()}
    assert by_id["m5.large"]["status"] == "active"
    assert by_id["m5.large"]["memory_amount"] == 16384
    assert by_id["c5.large"]["status"] == "inactive"

    prices = read_snapshot(spark, os.path.join(lake, "server_price"))
    live = prices.filter(F.col("status") == "active")
    assert live.count() == 2
    assert {r["price"] for r in live.collect()} == {0.099}


def _write_vendor_bronze(root, vendor, itype, price):
    d = os.path.join(root, vendor)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "instance_types.json"), "w") as fh:
        fh.write(_instance(itype, 2, 8192))
    with open(os.path.join(d, "products.json"), "w") as fh:
        fh.write(_product(itype, "US East (N. Virginia)", price))
    with open(os.path.join(d, "regions.json"), "w") as fh:
        fh.write(json.dumps({"region_id": "us-east-1",
                             "name": "US East (N. Virginia)",
                             "aliases": ["Virginia"]}))
    with open(os.path.join(d, "zones.json"), "w") as fh:
        fh.write(json.dumps({"region_id": "us-east-1",
                             "zones": ["use1-az1"]}))


def test_inventory_scope_is_per_vendor(spark, tmp_path):
    """Pulling vendor B must NOT inactivate vendor A's rows (the
    reference's UPDATE is vendor-scoped, tables.py:224-283)."""
    bronze = str(tmp_path / "bronze")
    lake = str(tmp_path / "lake")
    _write_vendor_bronze(bronze, "aws", "m5.large", 0.096)
    _write_vendor_bronze(bronze, "emu", "e1.small", 0.010)
    cli.cmd_inventory(spark, bronze, lake, vendor="aws")
    cli.cmd_inventory(spark, bronze, lake, vendor="emu")

    servers = read_snapshot(spark, os.path.join(lake, "server"))
    status = {(r["vendor_id"], r["server_id"]): r["status"]
              for r in servers.collect()}
    assert status == {("aws", "m5.large"): "active",
                      ("emu", "e1.small"): "active"}

    # re-pull ONLY aws with the instance gone: aws row flips, emu stays
    _write_vendor_bronze(bronze, "aws", "m6.large", 0.10)
    cli.cmd_inventory(spark, bronze, lake, vendor="aws")
    servers = read_snapshot(spark, os.path.join(lake, "server"))
    status = {(r["vendor_id"], r["server_id"]): r["status"]
              for r in servers.collect()}
    assert status[("aws", "m5.large")] == "inactive"
    assert status[("aws", "m6.large")] == "active"
    assert status[("emu", "e1.small")] == "active"


def test_inventory_gcp_azure_hcloud_e2e(spark, tmp_path):
    """Non-AWS vendors land through their own standardizers into the
    shared server table (P1 for GCP _gcp.py:289-350, Azure
    _azure.py:453-579, data-driven spec for hcloud)."""
    bronze = str(tmp_path / "bronze")
    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(bronze, "gcp"))
    with open(os.path.join(bronze, "gcp", "machine_types.json"), "w") as fh:
        fh.write(json.dumps({
            "id": 3001, "name": "n2-standard-4", "description": "4/16",
            "guest_cpus": 4, "memory_mb": 16384, "is_shared_cpu": False,
            "deprecated": {"state": ""}}) + "\n")
        fh.write(json.dumps({
            "id": 3002, "name": "e2-micro", "description": "shared",
            "guest_cpus": 2, "memory_mb": 1024, "is_shared_cpu": True,
            "deprecated": {"state": ""}}))
    os.makedirs(os.path.join(bronze, "azure"))
    with open(os.path.join(bronze, "azure", "skus.json"), "w") as fh:
        fh.write(json.dumps({
            "name": "Standard_B2s", "family": "standardBSFamily",
            "capabilities": [
                {"name": "vCPUs", "value": "2"},
                {"name": "vCPUsAvailable", "value": "2"},
                {"name": "MemoryGB", "value": "4"},
                {"name": "CpuArchitectureType", "value": "x64"}]}))
    os.makedirs(os.path.join(bronze, "hcloud"))
    with open(os.path.join(bronze, "hcloud", "servers.json"), "w") as fh:
        fh.write(json.dumps({
            "id": 22, "name": "cx22", "cores": 2, "memory": 4.0,
            "disk": 40, "cpu_type": "shared", "architecture": "x86"}))

    for v in ("gcp", "azure", "hcloud"):
        cli.cmd_inventory(spark, bronze, lake, vendor=v)

    servers = read_snapshot(spark, os.path.join(lake, "server"))
    rows = {(r["vendor_id"], r["server_id"]): r for r in servers.collect()}
    assert set(rows) == {("gcp", "3001"), ("gcp", "3002"),
                         ("azure", "Standard_B2s"), ("hcloud", "22")}
    assert all(r["status"] == "active" for r in rows.values())
    assert rows[("azure", "Standard_B2s")]["cpu_allocation"] == "Burstable"
    assert rows[("hcloud", "22")]["memory_amount"] == 4096

    # re-pull gcp without e2-micro: only the gcp row flips inactive
    with open(os.path.join(bronze, "gcp", "machine_types.json"), "w") as fh:
        fh.write(json.dumps({
            "id": 3001, "name": "n2-standard-4", "description": "4/16",
            "guest_cpus": 4, "memory_mb": 16384, "is_shared_cpu": False,
            "deprecated": {"state": ""}}))
    cli.cmd_inventory(spark, bronze, lake, vendor="gcp")
    servers = read_snapshot(spark, os.path.join(lake, "server"))
    status = {(r["vendor_id"], r["server_id"]): r["status"]
              for r in servers.collect()}
    assert status[("gcp", "3002")] == "inactive"
    assert status[("gcp", "3001")] == "active"
    assert status[("azure", "Standard_B2s")] == "active"
    assert status[("hcloud", "22")] == "active"


def test_inventory_vultr_and_invalid_side_table(spark, tmp_path):
    """The generic servers.json path works for flat specs (vultr), and
    rows failing validation land in server_invalid instead of aborting
    (P8 quarantine semantics)."""
    bronze = str(tmp_path / "bronze")
    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(bronze, "vultr"))
    with open(os.path.join(bronze, "vultr", "servers.json"), "w") as fh:
        fh.write(json.dumps({
            "id": "vc2-1c-1gb", "vcpu_count": 1, "cpu_count": None,
            "cpu_threads": None, "cpu_mhz": 2400, "ram": 1024,
            "disk": 25, "cpu_family": None}) + "\n")
        # invalid: no vcpu/cpu counts at all -> vcpus NULL -> quarantined
        fh.write(json.dumps({
            "id": "broken-sku", "vcpu_count": None, "cpu_count": None,
            "cpu_threads": None, "cpu_mhz": None, "ram": 512, "disk": 10,
            "cpu_family": None}))
    cli.cmd_inventory(spark, bronze, lake, vendor="vultr")

    servers = read_snapshot(spark, os.path.join(lake, "server"))
    rows = {r["server_id"]: r for r in servers.collect()}
    assert set(rows) == {"vc2-1c-1gb"}
    assert rows["vc2-1c-1gb"]["vcpus"] == 1
    assert rows["vc2-1c-1gb"]["cpu_speed"] == 2.4
    assert rows["vc2-1c-1gb"]["cpu_allocation"] == "Shared"

    invalid = read_snapshot(spark, os.path.join(lake, "server_invalid"))
    bad = invalid.collect()
    assert len(bad) == 1 and bad[0]["server_id"] == "broken-sku"
    assert "vcpus" in bad[0]["_errors"]
