"""Digest-keyed dedup index as a LAKE ARTIFACT (r8/r9 verdict task:
``cmd_index``) — the multi-session form of the per-session pair memo.

A 100 TB corpus is shingled and signed ONCE; every later session —
incremental daily batches, cluster resolution, PageRank canonicalization
— reads the landed index instead of re-hashing the corpus. The artifact
is keyed by an order-independent content digest of the exact (id, text)
corpus it was built from, so a reader can prove the index still
describes the corpus in front of it before trusting a single pair;
digest mismatch (or parameter mismatch) means rebuild, never silent
reuse.

Layout under ``<out>/``::

    _META.json    {digest, n_docs, text_col, id_col, k, n_hashes,
                   band_rows, threshold}
    shingles/     (id, shingles array<string>)  — Jaccard verify side
    signatures/   (id, mh_0..mh_{n-1})          — incremental band probe
    bands/        (id, band, sig)               — LSH buckets, laid out
                  by (band, sig) so bucket joins co-locate
    pairs/        (id_a, id_b, jaccard)         — the verified pair
                  graph every graph consumer (connected components,
                  PageRank, canonical_by_rank) walks

Reference parity: the reference engine memoizes fetches on disk
(SURVEY.md §2.13 X3); this is that idea applied to the dedup family's
expensive intermediate, Spark-first (plain parquet, readable by any
engine).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_NAME = "_META.json"


def corpus_digest(df: DataFrame, text_col: str, id_col: str) -> str:
    """Order-independent content digest of an (id, text) corpus:
    ``bit_xor(xxhash64(id, text))`` plus the row count (xor alone would
    miss duplicated rows canceling out). One column-pruned scan, fixed
    aggregation state — O(1) memory at any corpus size, and the same
    rows in any partitioning or arrival order digest identically."""
    row = df.select(
        F.expr(f"bit_xor(xxhash64({id_col}, {text_col}))").alias("d"),
        F.count("*").alias("n"),
    ).first()
    return f"{row['d']}_{row['n']}"


def write_minhash_index(df: DataFrame, out: str, text_col: str,
                        id_col: str, k: int = 3, n_hashes: int = 8,
                        band_rows: int = 2,
                        threshold: float = 0.5) -> dict:
    """Build and land the full dedup index for ``df`` at ``out``.

    One shingle pass feeds signatures, bands and the verified pair
    graph; the meta file is written LAST so a crashed build never
    presents as a valid artifact (readers key on _META.json)."""
    from ..operators.dedup import (
        _band_table, _signatures_from_shingles, doc_shingles,
        verified_pairs_from_index)

    digest = corpus_digest(df, text_col, id_col)
    meta = {
        "digest": digest,
        "text_col": text_col, "id_col": id_col,
        "k": k, "n_hashes": n_hashes, "band_rows": band_rows,
        "threshold": threshold,
    }
    sh = doc_shingles(df, text_col, id_col, k)
    sh.write.mode("overwrite").parquet(os.path.join(out, "shingles"))

    spark = df.sparkSession
    sh_stored = spark.read.parquet(os.path.join(out, "shingles"))
    sig = _signatures_from_shingles(sh_stored, id_col, n_hashes)
    sig.write.mode("overwrite").parquet(os.path.join(out, "signatures"))

    sig_stored = spark.read.parquet(os.path.join(out, "signatures"))
    bands = _band_table(sig_stored, id_col, n_hashes, band_rows)
    # (band, sig)-clustered layout: incremental probes join co-located
    # buckets instead of shuffling the whole band table per batch
    bands.repartition("band", "sig").write.mode("overwrite").parquet(
        os.path.join(out, "bands"))

    # pair graph from the STORED tables — the corpus is scanned once
    # (the shingle pass); everything downstream reads bronze
    bands_stored = spark.read.parquet(os.path.join(out, "bands"))
    pairs = verified_pairs_from_index(sh_stored, bands_stored, id_col,
                                      threshold)
    pairs.write.mode("overwrite").parquet(os.path.join(out, "pairs"))

    with open(os.path.join(out, META_NAME), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


def read_index_meta(out: str) -> dict | None:
    """The artifact's meta, or None when ``out`` holds no (complete)
    index — a build that died before the final meta write reads as
    absent, which is the correct answer."""
    try:
        with open(os.path.join(out, META_NAME)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def index_matches(out: str, digest: str, **params) -> bool:
    """True iff a complete artifact at ``out`` was built from exactly
    the corpus with ``digest`` under exactly ``params`` (k, n_hashes,
    band_rows, threshold...). The gate every reader must pass before
    trusting stored pairs."""
    meta = read_index_meta(out)
    if meta is None or meta.get("digest") != digest:
        return False
    return all(meta.get(k) == v for k, v in params.items())


def load_minhash_index(spark: SparkSession,
                       out: str) -> tuple[DataFrame, DataFrame]:
    """(shingles, signatures) in the shape
    operators/dedup.minhash_index returns — a drop-in base_index for
    incremental_minhash_pairs, read from disk instead of recomputed."""
    return (spark.read.parquet(os.path.join(out, "shingles")),
            spark.read.parquet(os.path.join(out, "signatures")))


def load_pair_graph(spark: SparkSession, out: str) -> DataFrame:
    """The landed verified pair graph (id_a, id_b, jaccard)."""
    return spark.read.parquet(os.path.join(out, "pairs"))
