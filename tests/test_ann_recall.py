"""ANN quality gate: recall@5 of the approximate similarity tiers
(LSH, IVF) against the exact brute-force baseline on the embeddings
fixture. An approximate index that silently returns garbage would pass
row-count/schema checks — recall is the metric that grades it."""

from __future__ import annotations

from sc_crawler_spark.queries.pipeline import (
    embed_ann_ivf,
    embed_ann_lsh,
    embed_cosine_topk,
)

SF = "/root/testdata/sf0.01"


def _neighbors(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict, exact: dict) -> float:
    per_q = [len(approx.get(q, set()) & nbrs) / len(nbrs)
             for q, nbrs in exact.items()]
    return sum(per_q) / len(per_q)


def test_ann_recall_at_5(spark):
    exact = _neighbors(embed_cosine_topk(spark, SF))
    assert exact and all(len(v) == 5 for v in exact.values())
    r_lsh = _recall(_neighbors(embed_ann_lsh(spark, SF)), exact)
    r_ivf = _recall(_neighbors(embed_ann_ivf(spark, SF)), exact)
    # floors chosen below the measured values (documented in README) so
    # the gate catches regressions without flaking on fixture noise
    assert r_lsh >= 0.8, f"LSH recall@5 regressed: {r_lsh:.3f}"  # measured 0.88
    assert r_ivf >= 0.8, f"IVF recall@5 regressed: {r_ivf:.3f}"  # measured 0.82
    print(f"recall@5 lsh={r_lsh:.3f} ivf={r_ivf:.3f}")
