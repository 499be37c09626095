"""A/B: hybrid RRF served fused-top-5 overlap vs in-plan at dense-arm
n_probe in {3, 4, 5} (8-cell IVF artifact) on sf0.01. r17 verdict
task 3b: the 64x overlap sits at 0.66 vs a 0.6 gate — find the probe
depth that buys >= 0.7 at bounded extra scan."""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import sc_crawler_spark.queries.pipeline as pl  # noqa: E402
from sc_crawler_spark.session import get_spark  # noqa: E402
from sc_crawler_spark.sinks import ann_store, postings_store  # noqa: E402
from sc_crawler_spark.tables import load  # noqa: E402

SF = "/root/testdata/sf0.01"


def main():
    spark = get_spark("ab-hybrid-probe", shuffle_partitions=8,
                      prefer_shuffled_hash=True)
    tmp = tempfile.mkdtemp(prefix="ab_hyb_")
    try:
        inplan = {(r.query_id, r.doc_id)
                  for r in pl.hybrid_rrf_retrieval(spark, SF).collect()}
        docs = load(spark, SF, "documents").select("doc_id", "text")
        emb = load(spark, SF, "embeddings")
        bidx, aidx = f"{tmp}/bm25", f"{tmp}/ivf8"
        postings_store.write_bm25_index(docs, bidx, "text", "doc_id",
                                        max_postings=256)
        ann_store.write_ivf_index(emb, aidx, "embedding", "vec_id",
                                  n_cells=8, iters=2)
        os.environ["SC_SPARK_BM25_INDEX_DIR"] = bidx
        os.environ["SC_SPARK_ANN_INDEX_DIR"] = aidx
        for n_probe in (3, 4, 5):
            pl._SERVE_IVF_N_PROBE = n_probe  # knob under test
            t0 = time.perf_counter()
            served = {(r.query_id, r.doc_id)
                      for r in pl.hybrid_rrf_retrieval(spark, SF)
                      .collect()}
            dt = time.perf_counter() - t0
            ov = len(served & inplan) / len(inplan)
            print(f"n_probe={n_probe} overlap={ov:.3f} serve={dt:.2f}s")
    finally:
        os.environ.pop("SC_SPARK_BM25_INDEX_DIR", None)
        os.environ.pop("SC_SPARK_ANN_INDEX_DIR", None)
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
