#!/usr/bin/env python
"""r18 task 1: A/B the corpus-pass count of the tf-idf / unigram-LM
dictionary regime at the 64x (512x docs) corpus.

The r17 dict regime pays THREE scan+tokenize passes for doc_lm
(tf branch, c_tbl branch, total branch — Catalyst does not dedupe
common subtrees) and the driver bench showed it ~2.4x slower than the
r16 window regime on the driver box. Arms:

  W  (r14-r16): term-partitioned window, 2 tokenizes + full-tf term
     exchange + per-doc re-shuffle.
  D2 (r17, current): broadcast dictionary, 3 tokenizes, zero-shuffle
     tf, per-doc partial agg in scan partitioning.
  D1 (r18 candidate): D2 but ``total`` folded INTO the dictionary via
     a global window over the vocab-sized c_tbl — 2 tokenizes, same
     everything else. total = sum of per-term counts == sum of
     size(toks): identical integers.
  X  (r18 candidate): ONE tokenize — the tf table is materialized
     through a doc_id repartition whose Exchange is REUSED by both
     the dictionary branch (groupBy term over tf rows) and the per-doc
     agg (which then needs NO further exchange: already doc_id
     partitioned). Honest per-action recompute (no persist).

tfidf arms: D2 (current) vs X (same exchange-reuse idea; df =
count of tf rows per term == count of docs containing term).

Each arm is checked bit-identical (exceptAll both ways) against the
registry form, then timed interleaved best-of-3 with the noop sink.
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


def _lm_finish(per_doc):
    from sc_crawler_spark.functions.scalars import dround
    xent = dround(F.col("sbits").cast("double")
                  / F.col("n_tokens").cast("double"), 6)
    return per_doc.select(
        "doc_id", "n_tokens", xent.alias("bits_per_token"),
        dround(F.pow(F.lit(2.0), xent), 4).alias("perplexity"))


def lm_w(docs):
    """Window regime (r14-r16) — SC_SPARK_TERM_DICT_MAX_CORPUS_BYTES=0
    reproduces this from the registry; inlined so one session can time
    all arms."""
    from sc_crawler_spark.queries.pipeline import _unigram_lm_per_doc
    return _lm_finish(_unigram_lm_per_doc(docs, use_dict=False))


def lm_d2(docs):
    from sc_crawler_spark.queries.pipeline import _unigram_lm_per_doc
    return _lm_finish(_unigram_lm_per_doc(docs, use_dict=True))


def lm_d1(docs):
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    tf = _tf_from_toked(toked)
    c_tbl = (toked.select(F.explode("toks").alias("term"))
             .groupBy("term").agg(F.count("*").alias("_c"))
             .withColumn("_total",
                         F.sum("_c").over(Window.partitionBy())))
    bits = (-F.col("tf")
            * F.log2(F.col("_c").cast("double")
                     / F.col("_total").cast("double"))
            ).cast("decimal(28,12)")
    per_doc = (tf.join(F.broadcast(c_tbl), "term")
               .withColumn("bits", bits)
               .groupBy("doc_id")
               .agg(F.sum("tf").alias("n_tokens"),
                    F.sum("bits").alias("sbits")))
    return _lm_finish(per_doc)


def lm_x(docs):
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    tf = _tf_from_toked(toked).repartition("doc_id")
    c_tbl = (tf.groupBy("term").agg(F.sum("tf").alias("_c"))
             .withColumn("_total",
                         F.sum("_c").over(Window.partitionBy())))
    bits = (-F.col("tf")
            * F.log2(F.col("_c").cast("double")
                     / F.col("_total").cast("double"))
            ).cast("decimal(28,12)")
    per_doc = (tf.join(F.broadcast(c_tbl), "term")
               .withColumn("bits", bits)
               .groupBy("doc_id")
               .agg(F.sum("tf").alias("n_tokens"),
                    F.sum("bits").alias("sbits")))
    return _lm_finish(per_doc)


def tfidf_d2(docs):
    from sc_crawler_spark.queries.pipeline import tfidf_keywords  # noqa
    # current registry shape, inlined (gate-independent)
    from sc_crawler_spark.functions.scalars import dround
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    tf = _tf_from_toked(toked)
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    df_tbl = (toked.select(F.explode(F.array_distinct("toks"))
                           .alias("term"))
              .groupBy("term").agg(F.count("*").alias("df")))
    score = (F.col("tf")
             * F.log2((F.col("n_docs") + F.lit(1.0))
                      / (F.col("df") + F.lit(1.0)))
             ).cast("decimal(28,12)")
    scored = (tf.join(F.broadcast(df_tbl), "term")
              .join(F.broadcast(n_docs))
              .withColumn("tfidf", dround(score, 6)))
    topk = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (scored.withColumn("rn", F.row_number().over(topk))
            .filter(F.col("rn") <= 3)
            .select("doc_id", "term", "tf", "tfidf"))


def tfidf_x(docs):
    from sc_crawler_spark.functions.scalars import dround
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    tf = _tf_from_toked(toked).repartition("doc_id")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = (F.col("tf")
             * F.log2((F.col("n_docs") + F.lit(1.0))
                      / (F.col("df") + F.lit(1.0)))
             ).cast("decimal(28,12)")
    scored = (tf.join(F.broadcast(df_tbl), "term")
              .join(F.broadcast(n_docs))
              .withColumn("tfidf", dround(score, 6)))
    topk = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (scored.withColumn("rn", F.row_number().over(topk))
            .filter(F.col("rn") <= 3)
            .select("doc_id", "term", "tf", "tfidf"))


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    spark = get_spark("ab-lmdict-r18", shuffle_partitions=None,
                      prefer_shuffled_hash=True, task_max_failures=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    from sc_crawler_spark.tables import load

    docs = load(spark, SCALE_DIR, "documents")

    arms = {"lm": [("W", lm_w), ("D2", lm_d2), ("D1", lm_d1),
                   ("X", lm_x)],
            "tfidf": [("D2", tfidf_d2), ("X", tfidf_x)]}
    for fam, forms in arms.items():
        ref_name, ref = forms[0][0], forms[0][1](docs)
        built = [(n, mk(docs)) for n, mk in forms[1:]]
        for n, df in built:
            d1 = df.exceptAll(ref).limit(1).count()
            d2 = ref.exceptAll(df).limit(1).count()
            print(f"{fam} {n} vs {ref_name}: diff={d1}+{d2}", flush=True)
        for rep in range(3):
            for n, df in [(ref_name, ref)] + built:
                timed(spark, f"{fam}.{n}.{rep}", lambda d=df: noop(d))
    spark.stop()


if __name__ == "__main__":
    main()
