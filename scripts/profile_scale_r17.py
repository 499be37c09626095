#!/usr/bin/env python
"""r17 optimization: sub-stage breakdown of the expensive 64x scale
queries (guide 1.1/1.4 — find where the seconds go before changing
anything). Times each query's intermediate DataFrames to the noop sink
(computes every column, discards output) with setJobDescription labels,
best-of-2 per sub-stage.

Usage: python scripts/profile_scale_r17.py [name ...]
Requires the bench scale dirs to exist (/tmp/sc_bench_scale64 et al. —
run bench.py first). Writes plans/r17/scale_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sc_crawler_spark.session import get_spark  # noqa: E402
from sc_crawler_spark.tables import load  # noqa: E402

SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sc_bench_scale64")
ZIPF = os.path.join(SCALE_DIR, "zipf")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, thunk, reps=2):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({label: round(best, 3)}), flush=True)
    return round(best, 3)


def profile_tfidf(spark, out):
    from sc_crawler_spark.queries.pipeline import _tf_from_toked, tfidf_keywords
    from sc_crawler_spark.functions.text import tokens
    docs = load(spark, SCALE_DIR, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    out["tfidf.scan_tokenize"] = timed(
        spark, "tfidf.scan_tokenize",
        lambda: noop(toked.select("doc_id", F.size("toks").alias("n"))))
    tf = _tf_from_toked(toked)
    out["tfidf.tf"] = timed(spark, "tfidf.tf", lambda: noop(tf))
    from pyspark.sql import Window
    rel = tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    out["tfidf.tf_plus_window"] = timed(
        spark, "tfidf.tf_plus_window", lambda: noop(rel))
    out["tfidf.full"] = timed(
        spark, "tfidf.full",
        lambda: tfidf_keywords(spark, SCALE_DIR).count())


def profile_lm(spark, out):
    from sc_crawler_spark.queries.pipeline import doc_lm_perplexity
    out["lm.full"] = timed(
        spark, "lm.full", lambda: doc_lm_perplexity(spark, SCALE_DIR).count())


def profile_tss(spark, out):
    from sc_crawler_spark.queries.pipeline import (
        _docs_with_clones, training_set_select)
    from sc_crawler_spark.functions.text import (
        LANG_MARKERS, quality_score, tokens)
    corpus = _docs_with_clones(spark, SCALE_DIR)
    out["tss.scan"] = timed(
        spark, "tss.scan",
        lambda: noop(corpus.select("doc_id", F.length("text").alias("n"))))
    out["tss.sha"] = timed(
        spark, "tss.sha",
        lambda: noop(corpus.select("doc_id",
                                   F.sha2(F.col("text"), 256).alias("s"))))
    out["tss.quality"] = timed(
        spark, "tss.quality",
        lambda: noop(corpus.select(
            "doc_id", quality_score(F.col("text")).alias("q"))))
    toks = tokens(F.col("text"))
    hits = [F.size(F.filter(toks, lambda t: t.isin(*m))).alias(f"h_{l}")
            for l, m in LANG_MARKERS.items()]
    out["tss.langhits"] = timed(
        spark, "tss.langhits",
        lambda: noop(corpus.select("doc_id", *hits)))
    out["tss.full"] = timed(
        spark, "tss.full",
        lambda: training_set_select(spark, SCALE_DIR).count())


def profile_minhash(spark, out):
    from sc_crawler_spark.operators.dedup import (
        _band_table, _fast_signatures_from_shingles, doc_shingles,
        minhash_lsh_pairs)
    from sc_crawler_spark.queries.pipeline import _docs_with_clones
    corpus = _docs_with_clones(spark, SCALE_DIR)
    sh = doc_shingles(corpus, "text", "doc_id", 3)
    out["minhash.shingles"] = timed(
        spark, "minhash.shingles", lambda: noop(sh))
    sig = _fast_signatures_from_shingles(sh, "doc_id", 8)
    out["minhash.signatures"] = timed(
        spark, "minhash.signatures", lambda: noop(sig))
    def _full():
        spark.catalog.clearCache()
        minhash_lsh_pairs(corpus, "text", "doc_id", k=3, n_hashes=8,
                          band_rows=2, threshold=0.5,
                          fast_signatures=True).count()
        spark.catalog.clearCache()
    out["minhash.full"] = timed(spark, "minhash.full", _full)


def profile_bm25(spark, out):
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.queries.pipeline import (
        _bm25_scored, _tf_from_toked, bm25_retrieval)
    docs = load(spark, ZIPF, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    corpus = toked.filter(F.col("doc_id") % 13 != 0)
    tf = _tf_from_toked(corpus)
    out["bm25.tf"] = timed(spark, "bm25.tf", lambda: noop(tf))
    lens = corpus.select("doc_id", F.size("toks").alias("len_d"))
    out["bm25.lens"] = timed(spark, "bm25.lens", lambda: noop(lens))
    q_terms = (toked.filter(F.col("doc_id") % 130_000 == 0)
               .select(F.col("doc_id").alias("query_id"),
                       F.explode(F.array_distinct(
                           F.slice("toks", 1, 8))).alias("term")))
    scored = _bm25_scored(toked, q_terms)
    out["bm25.scored"] = timed(spark, "bm25.scored", lambda: noop(scored))
    out["bm25.full"] = timed(
        spark, "bm25.full",
        lambda: bm25_retrieval(spark, ZIPF, query_stride=130_000).count())


PROFILES = {
    "tfidf": profile_tfidf,
    "lm": profile_lm,
    "tss": profile_tss,
    "minhash": profile_minhash,
    "bm25": profile_bm25,
}


def main() -> None:
    names = sys.argv[1:] or list(PROFILES)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    spark = get_spark("sc-crawler-scale-profile", shuffle_partitions=None,
                      prefer_shuffled_hash=True, task_max_failures=4)
    spark.sparkContext.setLogLevel("ERROR")
    # the bench auto-sizes shuffle partitions per query from scan bytes;
    # the profile uses the same order of magnitude for the doc queries
    # (zipf documents ~ 1 GB -> 64 partitions at 16 MB each)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    out: dict[str, float] = {}
    for n in names:
        PROFILES[n](spark, out)
    os.makedirs("plans/r17", exist_ok=True)
    path = "plans/r17/scale_profile.json"
    prev = {}
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
    prev.update(out)
    with open(path, "w") as fh:
        json.dump(prev, fh, indent=1, sort_keys=True)
    print("TOTAL", json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
