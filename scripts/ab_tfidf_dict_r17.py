#!/usr/bin/env python
"""r17: A/B the term-statistics computation for tfidf_keywords and
doc_lm_perplexity at the 64x (512x docs) corpus.

A (r14-r16): df / corpus-count via a term-partitioned window over the
   full (doc, term) tf table — one full skewed exchange of tf plus an
   in-partition sort by term, and the top-k / per-doc stage downstream
   starts from term partitioning, so its partial WindowGroupLimit
   barely filters (a doc's terms are spread over every partition).
B (r17): the per-term statistic as a broadcast dictionary built from
   one row-local corpus pass (explode [array_distinct] toks ->
   partially-aggregated count). tf stays zero-shuffle in scan
   partitioning where a doc's rows are CONTIGUOUS, so the partial
   WindowGroupLimit before the per-doc exchange keeps exactly k
   rows/doc and the exchange ships k rows/doc instead of all terms.

Checks B is bit-identical to A (exceptAll both ways), prints the
vocabulary size (the broadcast build input), then times interleaved.
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


def tfidf_a(docs):
    """The r14-r16 window shape, reproduced verbatim."""
    from sc_crawler_spark.functions.scalars import dround
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    tf = _tf_from_toked(
        docs.select("doc_id", tokens(F.col("text")).alias("toks")))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    df_w = Window.partitionBy("term")
    score = (F.col("tf")
             * F.log2((F.col("n_docs") + F.lit(1.0))
                      / (F.count("*").over(df_w) + F.lit(1.0)))
             ).cast("decimal(28,12)")
    scored = (tf.join(F.broadcast(n_docs))
              .withColumn("tfidf", dround(score, 6)))
    topk = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (scored.withColumn("rn", F.row_number().over(topk))
            .filter(F.col("rn") <= 3)
            .select("doc_id", "term", "tf", "tfidf"))


def tfidf_b(docs):
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


def lm_a(docs):
    from sc_crawler_spark.functions.scalars import dround
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    tf = _tf_from_toked(
        docs.select("doc_id", tokens(F.col("text")).alias("toks")))
    total = docs.agg(F.sum(F.size(tokens(F.col("text")))).alias("total"))
    c_w = Window.partitionBy("term")
    bits = (-F.col("tf")
            * F.log2(F.sum("tf").over(c_w).cast("double")
                     / F.col("total").cast("double"))
            ).cast("decimal(28,12)")
    per_doc = (tf.join(F.broadcast(total))
               .withColumn("bits", bits)
               .groupBy("doc_id")
               .agg(F.sum("tf").alias("n_tokens"),
                    F.sum("bits").alias("sbits")))
    xent = dround(F.col("sbits").cast("double")
                  / F.col("n_tokens").cast("double"), 6)
    return per_doc.select(
        "doc_id", "n_tokens", xent.alias("bits_per_token"),
        dround(F.pow(F.lit(2.0), xent), 4).alias("perplexity"))


def lm_b(docs):
    from sc_crawler_spark.functions.scalars import dround
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import _tf_from_toked
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    tf = _tf_from_toked(toked)
    total = toked.agg(F.sum(F.size("toks")).alias("total"))
    c_tbl = (toked.select(F.explode("toks").alias("term"))
             .groupBy("term").agg(F.count("*").alias("c")))
    bits = (-F.col("tf")
            * F.log2(F.col("c").cast("double")
                     / F.col("total").cast("double"))
            ).cast("decimal(28,12)")
    per_doc = (tf.join(F.broadcast(c_tbl), "term")
               .join(F.broadcast(total))
               .withColumn("bits", bits)
               .groupBy("doc_id")
               .agg(F.sum("tf").alias("n_tokens"),
                    F.sum("bits").alias("sbits")))
    xent = dround(F.col("sbits").cast("double")
                  / F.col("n_tokens").cast("double"), 6)
    return per_doc.select(
        "doc_id", "n_tokens", xent.alias("bits_per_token"),
        dround(F.pow(F.lit(2.0), xent), 4).alias("perplexity"))


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    spark = get_spark("ab-tfidf-dict-r17", shuffle_partitions=None,
                      prefer_shuffled_hash=True, task_max_failures=4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.tables import load

    docs = load(spark, SCALE_DIR, "documents")
    vocab = (docs.select(F.explode(F.array_distinct(
        tokens(F.col("text")))).alias("term"))
        .groupBy("term").count())
    n_vocab = vocab.count()
    print(f"vocab terms: {n_vocab}", flush=True)

    for name, mk_a, mk_b in (("tfidf", tfidf_a, tfidf_b),
                             ("lm", lm_a, lm_b)):
        a, b = mk_a(docs), mk_b(docs)
        d1 = b.exceptAll(a).limit(1).count()
        d2 = a.exceptAll(b).limit(1).count()
        print(f"{name} equivalence: b-a={d1} a-b={d2}", flush=True)
        for rep in range(3):
            timed(spark, f"A.{name}.{rep}", lambda: noop(a))
            timed(spark, f"B.{name}.{rep}", lambda: noop(b))
    spark.stop()


if __name__ == "__main__":
    main()
