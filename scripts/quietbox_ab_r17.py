"""r17 verdict tasks 5 + 6: quiet-box interleaved A/B for
training_set_select at 64x (is the r16 +28% a regression or box/data
drift?) and the q5 job/stage-count breakdown at 64x (the 2.1x floor
adjudication). Replicates the bench session + sizing exactly."""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from sc_crawler_spark.session import get_spark  # noqa: E402

S16 = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sc_bench_scale64")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duck_run(sql: str) -> float:
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = os.path.join(S16, f"{t}.parquet")
            if os.path.isdir(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
            elif os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0
    finally:
        con.close()


def sized_parts(spark, tables: list[str]) -> int:
    scan_b = 0
    for t in tables:
        p = os.path.join(S16, f"{t}.parquet")
        if os.path.isdir(p):
            scan_b += sum(os.path.getsize(os.path.join(p, f))
                          for f in os.listdir(p) if f.endswith(".parquet"))
        elif os.path.exists(p):
            scan_b += os.path.getsize(p)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return max(8, min(2 * cpus, scan_b // (16 * 1024 * 1024)))


def main():
    from sc_crawler_spark.queries import REGISTRY

    spark = get_spark("quietbox-ab-r17", prefer_shuffled_hash=True)
    print("loadavg:", [round(x, 2) for x in os.getloadavg()])

    # ---- training_set_select: 3 interleaved reps each engine
    name = "training_set_select"
    fn, sql = REGISTRY[name]
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(sized_parts(spark, ["documents", "documents"])))
    for rep in range(3):
        t0 = time.perf_counter()
        fn(spark, S16).count()
        sw = time.perf_counter() - t0
        dw = duck_run(sql)
        print(f"{name} rep{rep}: spark={sw:.2f}s duck={dw:.2f}s "
              f"loadavg={os.getloadavg()[0]:.1f}")
        spark.catalog.clearCache()

    # ---- q5 bucketed: wall + job/stage counts
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench
    facts = bench._mount_bucketed_facts(spark, S16)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
                   "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(sized_parts(
        spark, ["lineitem", "orders", "customer", "supplier",
                "nation", "region"])))
    q5 = REGISTRY["q5_local_supplier_volume"][0]
    sc = spark.sparkContext
    for rep in range(3):
        sc.setJobGroup(f"q5rep{rep}", "q5 bucketed 64x")
        t0 = time.perf_counter()
        q5(spark, S16, _tables=facts).count()
        sw = time.perf_counter() - t0
        jids = sc.statusTracker().getJobIdsForGroup(f"q5rep{rep}")
        stages = set()
        for j in jids:
            info = sc.statusTracker().getJobInfo(j)
            if info:
                stages.update(info.stageIds)
        dw = duck_run(REGISTRY["q5_local_supplier_volume"][1])
        print(f"q5 rep{rep}: spark={sw:.2f}s duck={dw:.2f}s "
              f"jobs={len(jids)} stages={len(stages)}")
    spark.stop()


if __name__ == "__main__":
    main()
