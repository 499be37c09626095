#!/usr/bin/env python
"""r18 task 6: bm25_retrieval residual — share the corpus tokenize.

The r17 exact-arm chain pays THREE full scan+tokenize passes of the
corpus (Catalyst does not dedupe common subtrees):

  tf     — _tf_from_toked (zero-shuffle run-length), 10.8 s of the
           26-36 s total at 64x/zipf;
  df     — explode(array_distinct(toks)) -> broadcast-filter to query
           terms -> partial count by term;
  stats  — corpus.agg(count, sum(size(toks))).

Arms:

  B (current): the registry in-plan chain verbatim.
  X (r18 candidate): ONE tokenize. tf (with len_d) is materialized
    through a doc_id repartition; the Exchange is REUSED by
      - scoring (tf broadcast-filtered to query terms),
      - df     (tf rows ARE (doc, distinct-term) pairs, so df =
                count of tf rows per term — identical integers),
      - stats  (groupBy doc_id needs NO further exchange: n_docs =
                count of docs, total_len = sum of per-doc len_d; every
                doc has >= 1 token via tokens(), so no doc is lost).
    Honest per-action recompute — exchange reuse, no persist.

Substage profile first (noop sink), then exceptAll equivalence, then
interleaved best-of-3.
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
ZIPF_DIR = os.path.join(SCALE_DIR, "zipf")
STRIDE = int(os.environ.get("SC_AB_STRIDE", "130000"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, thunk):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    thunk()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{label}: {dt:.3f}", flush=True)
    return dt


def _rank(scored):
    from sc_crawler_spark.functions.scalars import dround
    from sc_crawler_spark.queries.pipeline import _BM25_TOP_K
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _BM25_TOP_K)
            .select("query_id", "doc_id",
                    dround(F.col("s").cast("double"), 6)
                    .alias("bm25_score"),
                    F.col("rank").cast("long").alias("rank")))


def bm25_b(spark):
    from sc_crawler_spark.queries.pipeline import bm25_retrieval
    return bm25_retrieval(spark, ZIPF_DIR, query_stride=STRIDE)


def _q_terms(toked):
    return (toked.filter(F.col("doc_id") % STRIDE == 0)
            .select(F.col("doc_id").alias("query_id"),
                    F.explode(F.array_distinct(
                        F.slice("toks", 1, 8))).alias("term"))
            .distinct())


def bm25_x(spark):
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import (
        _BM25_B, _BM25_K1, _tf_from_toked)
    from sc_crawler_spark.tables import load
    docs = load(spark, ZIPF_DIR, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    q_terms = _q_terms(toked)
    corpus = toked.filter(F.col("doc_id") % 13 != 0)
    tf = _tf_from_toked(corpus, with_len=True).repartition("doc_id")
    stats = (tf.groupBy("doc_id").agg(F.first("len_d").alias("len_d"))
             .agg(F.count("*").alias("n_docs"),
                  F.sum("len_d").alias("total_len")))
    qdict = q_terms.select("term").distinct()
    df_tbl = (tf.join(F.broadcast(qdict), "term")
              .groupBy("term").agg(F.count("*").alias("df")))
    rel = (tf.join(F.broadcast(qdict), "term")
           .join(F.broadcast(df_tbl), "term"))
    hit = rel.join(F.broadcast(q_terms), "term")
    avgdl = (F.col("total_len").cast("double")
             / F.col("n_docs").cast("double"))
    idf = F.log2(
        F.lit(1.0)
        + (F.col("n_docs").cast("double")
           - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5)))
    denom = (F.col("tf").cast("double")
             + F.lit(_BM25_K1) * (F.lit(1.0 - _BM25_B)
                                  + F.lit(_BM25_B)
                                  * (F.col("len_d").cast("double")
                                     / avgdl)))
    contrib = (idf * ((F.col("tf").cast("double")
                       * F.lit(_BM25_K1 + 1.0)) / denom)) \
        .cast("decimal(28,12)")
    scored = (hit.join(F.broadcast(stats))
              .withColumn("c", contrib)
              .groupBy("query_id", "doc_id")
              .agg(F.sum("c").alias("s")))
    return _rank(scored)


def profile_substages(spark):
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    from sc_crawler_spark.tables import load
    docs = load(spark, ZIPF_DIR, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    corpus = toked.filter(F.col("doc_id") % 13 != 0)
    tf = _tf_from_toked(corpus, with_len=True)
    qdict = _q_terms(toked).select("term").distinct()
    df_tbl = (corpus.select(F.explode(F.array_distinct("toks"))
                            .alias("term"))
              .join(F.broadcast(qdict), "term")
              .groupBy("term").agg(F.count("*").alias("df")))
    stats = corpus.agg(F.count("*").alias("n_docs"),
                       F.sum(F.size("toks")).alias("total_len"))
    for rep in range(2):
        timed(spark, f"sub.tf.{rep}", lambda: noop(tf))
        timed(spark, f"sub.df.{rep}", lambda: noop(df_tbl))
        timed(spark, f"sub.stats.{rep}", lambda: noop(stats))
        timed(spark, f"sub.tf_xchg.{rep}",
              lambda: noop(tf.repartition("doc_id")))


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    spark = get_spark("ab-bm25-r18", shuffle_partitions=None,
                      prefer_shuffled_hash=True, task_max_failures=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    profile_substages(spark)

    b, x = bm25_b(spark), bm25_x(spark)
    d1 = x.exceptAll(b).limit(1).count()
    d2 = b.exceptAll(x).limit(1).count()
    print(f"bm25 X vs B: diff={d1}+{d2}", flush=True)
    for rep in range(3):
        timed(spark, f"bm25.B.{rep}", lambda: noop(b))
        timed(spark, f"bm25.X.{rep}", lambda: noop(x))
    spark.stop()


if __name__ == "__main__":
    main()
