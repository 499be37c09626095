#!/usr/bin/env python
"""r17 optimization: per-query profile of the GRADED sf0.1 block.

Replicates bench.py's graded-block session shape exactly (AQE off,
4 shuffle partitions, warm pass at sf0.001, prepared-plan best-of-3)
and records per query: build seconds, best/median execution seconds,
Spark job count and stage count for one execution (statusTracker over
a job group), plus ``explain('formatted')`` written to
plans/r17/<name>_<tag>.txt.

Usage: python scripts/profile_graded_r17.py [tag] [query ...]
(tag defaults to "before"; default query set = bench HEADLINE).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from sc_crawler_spark.queries import REGISTRY  # noqa: E402
from sc_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    spark = get_spark("sc-crawler-profile", shuffle_partitions=8,
                      prefer_shuffled_hash=True, task_max_failures=4)
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = sf_dir.replace("sf0.1", "sf0.001")
    for name in names:
        REGISTRY[name][0](spark, warm_dir).count()

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    os.makedirs("plans/r17", exist_ok=True)
    out = {}
    sc = spark.sparkContext
    for name in names:
        t0 = time.perf_counter()
        df = REGISTRY[name][0](spark, sf_dir)
        build = time.perf_counter() - t0
        # plan capture
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(f"plans/r17/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
        # timed reps; job/stage count measured on the LAST rep via a
        # job group so warm-up compilation doesn't inflate the count
        reps = []
        for rep in range(3):
            if rep == 2:
                sc.setJobGroup(f"prof_{name}", name)
            t0 = time.perf_counter()
            df.count()
            reps.append(time.perf_counter() - t0)
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(f"prof_{name}")
        n_stages = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
        sc.setJobGroup(None, None)
        out[name] = {"build": round(build, 3),
                     "best": round(min(reps), 3),
                     "reps": [round(r, 3) for r in reps],
                     "jobs": len(jobs), "stages": n_stages}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL best:", round(sum(v["best"] for v in out.values()), 3))
    with open(f"plans/r17/graded_profile_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
