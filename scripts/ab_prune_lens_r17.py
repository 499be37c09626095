#!/usr/bin/env python
"""Interleaved A/B: in-plan pruned-postings chain with the tf-to-lens
doc_id join (old) vs len_d carried through the tf explode (r17).
Equivalence by exceptAll both ways, timing best-of-3 with the noop
sink, at the 64x zipf retrieval corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sc_crawler_spark.queries.pipeline import (  # noqa: E402
    _BM25_MAX_POSTINGS, _bm25_corpus_stats, _bm25_prune_from_tf, tokens)
from sc_crawler_spark.session import get_spark  # noqa: E402

ZIPF = os.environ.get("ZIPF_DIR", "/tmp/sc_bench_scale64/zipf")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, reps=1):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s", flush=True)
    return best


def main():
    spark = get_spark("ab-prune-lens", shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(ZIPF, "documents.parquet"))
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))

    # OLD: split tables, prune tail joins lens on doc_id
    tf_o, lens_o = _bm25_corpus_stats(toked)
    old = _bm25_prune_from_tf(tf_o, lens_o, _BM25_MAX_POSTINGS)
    # NEW: len_d rides the explode, join skipped
    tf_n, lens_n = _bm25_corpus_stats(toked, with_len=True)
    new = _bm25_prune_from_tf(tf_n, lens_n, _BM25_MAX_POSTINGS)

    d1 = new.exceptAll(old).limit(1).count()
    d2 = old.exceptAll(new).limit(1).count()
    print(f"equivalence: new-old={d1} old-new={d2}", flush=True)

    for rep in range(3):
        timed(spark, f"A.lensjoin.{rep}", lambda: noop(old))
        timed(spark, f"B.lenride.{rep}", lambda: noop(new))
    spark.stop()


if __name__ == "__main__":
    main()
