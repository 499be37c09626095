"""A/B: recall@5 + serve time of the 64-cell IVF artifact serve at
n_probe in {8, 10, 12} on the sf0.01 gate fixture, and the hybrid
dense-arm fused overlap at n_probe in {3, 4} (8 cells). r17 verdict
task 3: buy >= 0.05 headroom over the 0.8 recall gate and >= 0.7
fused overlap, publish the curve, pick the knee."""
from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from sc_crawler_spark.queries.pipeline import embed_cosine_topk  # noqa: E402
from sc_crawler_spark.session import get_spark  # noqa: E402
from sc_crawler_spark.sinks import ann_store  # noqa: E402
from sc_crawler_spark.tables import load  # noqa: E402

SF = "/root/testdata/sf0.01"


def neighbors(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(approx, exact):
    per_q = [len(approx.get(q, set()) & n) / len(n)
             for q, n in exact.items()]
    return sum(per_q) / len(per_q)


def main():
    spark = get_spark("ab-ivf-probe", shuffle_partitions=8,
                      prefer_shuffled_hash=True)
    tmp = tempfile.mkdtemp(prefix="ab_ivf_")
    try:
        emb = load(spark, SF, "embeddings")
        out = f"{tmp}/ivf64"
        t0 = time.perf_counter()
        ann_store.write_ivf_index(emb, out, "embedding", "vec_id",
                                  n_cells=64, iters=2)
        print(f"build 64-cell: {time.perf_counter() - t0:.2f}s")
        exact = neighbors(embed_cosine_topk(spark, SF))
        q = emb.filter(F.col("vec_id") < 10)
        for n_probe in (8, 10, 12, 16):
            t0 = time.perf_counter()
            served = neighbors(ann_store.cosine_topk_served(
                q, spark, out, "embedding", "vec_id", k=5,
                n_probe=n_probe))
            dt = time.perf_counter() - t0
            print(f"n_probe={n_probe:2d} recall@5={recall(served, exact):.3f}"
                  f" serve={dt:.2f}s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
