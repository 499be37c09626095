#!/usr/bin/env python
"""r17: A/B the BM25 df computation at the 64x zipf corpus.

A (r14-r16): df from an orderless term-partitioned window over the
   query-relevant tf slice — one skewed full exchange of that slice,
   and the downstream (query, doc) groupBy re-shuffles ~every hit row
   because a pair's terms land in different term partitions.
B (r17): df as a broadcast dictionary built from one row-local corpus
   pass (explode distinct toks -> broadcast-filter to query terms ->
   partially-aggregated count). tf stays zero-shuffle, so the scoring
   chain is map-local and the groupBy partial-aggregates each
   (query, doc) pair's <=8 term rows before the single exchange.

Checks B's scored values are bit-identical to A's (exceptAll both
ways), then times interleaved best-of-3 at the bench stride (1300)
and the profile stride (130000).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sc_crawler_spark.session import get_spark  # noqa: E402

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sc_bench_scale64")
ZIPF = os.path.join(SCALE_DIR, "zipf")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, thunk, reps=3):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: {best:.3f}", flush=True)
    return best


def scored_a(toked, q_terms):
    """The r14-r16 window shape, reproduced verbatim."""
    from sc_crawler_spark.queries.pipeline import (
        _BM25_B, _BM25_K1, _tf_from_toked)
    corpus = toked.filter(F.col("doc_id") % 13 != 0)
    tf = _tf_from_toked(corpus, with_len=True)
    stats = corpus.agg(F.count("*").alias("n_docs"),
                       F.sum(F.size("toks")).alias("total_len"))
    rel = tf.join(F.broadcast(q_terms.select("term").distinct()), "term")
    rel = rel.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    hit = rel.join(F.broadcast(q_terms), "term")
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    idf = F.log2(F.lit(1.0) + (F.col("n_docs").cast("double")
                               - F.col("df").cast("double") + F.lit(0.5))
                 / (F.col("df").cast("double") + F.lit(0.5)))
    denom = (F.col("tf").cast("double")
             + F.lit(_BM25_K1) * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B)
                                  * (F.col("len_d").cast("double") / avgdl)))
    contrib = (idf * ((F.col("tf").cast("double") * F.lit(_BM25_K1 + 1.0))
                      / denom)).cast("decimal(28,12)")
    return (hit.join(F.broadcast(stats))
            .withColumn("c", contrib)
            .groupBy("query_id", "doc_id").agg(F.sum("c").alias("s")))


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    spark = get_spark("ab-bm25-df-r17", shuffle_partitions=None,
                      prefer_shuffled_hash=True, task_max_failures=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    from sc_crawler_spark.queries.pipeline import _bm25_scored
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.tables import load

    docs = load(spark, ZIPF, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))

    for stride in (130_000, 1300):
        q_terms = (toked.filter(F.col("doc_id") % stride == 0)
                   .select(F.col("doc_id").alias("query_id"),
                           F.explode(F.array_distinct(
                               F.slice("toks", 1, 8))).alias("term")))
        a = scored_a(toked, q_terms)
        b = _bm25_scored(toked, q_terms)
        if stride == 130_000:
            # bit-equality proof at the bench stride only: the full
            # stride-13 query set is already oracle-proven at sf0.01
            # (4 registry rows), and a stride-1300 exceptAll shuffles
            # the entire 2k-query hit set twice — it filled the disk.
            d1 = b.exceptAll(a).limit(1).count()
            d2 = a.exceptAll(b).limit(1).count()
            print(f"stride={stride} equivalence: b-a={d1} a-b={d2}",
                  flush=True)
        for rep in range(3):
            timed(spark, f"A.scored.{stride}", lambda: noop(a), reps=1)
            timed(spark, f"B.scored.{stride}", lambda: noop(b), reps=1)
    spark.stop()


if __name__ == "__main__":
    main()
