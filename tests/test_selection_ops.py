"""Semantic properties of the r13 data-selection / analytics tier —
invariants the DuckDB hash-parity check can't express (it proves both
engines agree, not that the math does what the method claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_unimax_allocation_meets_budget_and_caps(spark):
    from sc_crawler_spark.queries.curation import (
        _UNIMAX_BUDGET_FRAC, unimax_mixture_weights)

    rows = unimax_mixture_weights(spark, SF).collect()
    total_tokens = sum(r.n_tokens for r in rows)
    budget = int(total_tokens * _UNIMAX_BUDGET_FRAC)
    # every allocation respects its epoch cap
    for r in rows:
        assert r.alloc_tokens <= r.token_cap + 1e-6
        assert abs(r.epochs_used - r.alloc_tokens / r.n_tokens) < 1e-4
    # water level exhausts the budget exactly (nothing saturated ->
    # sum(min(cap, t)) == B by construction; allow rounding slack)
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 1.0


def test_dsir_excludes_target_and_ranks_are_dense(spark):
    from sc_crawler_spark.queries.curation import (
        _DSIR_K, _DSIR_TARGET, dsir_select)

    rows = dsir_select(spark, SF).collect()
    assert len(rows) == _DSIR_K
    assert all(r.source != _DSIR_TARGET for r in rows)
    assert sorted(r.sel_rank for r in rows) == list(range(1, _DSIR_K + 1))
    # selection follows the Gumbel key order
    by_rank = sorted(rows, key=lambda r: r.sel_rank)
    keys = [r.gumbel_key for r in by_rank]
    assert keys == sorted(keys, reverse=True)


def test_perplexity_buckets_are_ordered_and_partition(spark):
    from sc_crawler_spark.queries.pipeline import perplexity_bucket_filter

    rows = perplexity_bucket_filter(spark, SF).collect()
    assert len(rows) == 500  # every doc gets a bucket
    means = {}
    for b in ("head", "middle", "tail"):
        vals = [r.bits_per_token for r in rows if r.ppl_bucket == b]
        assert vals, f"bucket {b} empty"
        means[b] = sum(vals) / len(vals)
    assert means["head"] < means["middle"] < means["tail"]
    for r in rows:
        assert r.kept == (r.ppl_bucket != "tail")


def test_bm25_prefers_docs_containing_query_terms(spark):
    from sc_crawler_spark.queries.pipeline import bm25_retrieval
    from sc_crawler_spark.functions.text import tokens
    from sc_crawler_spark.tables import load

    hits = bm25_retrieval(spark, SF).collect()
    toks = {r.doc_id: r.toks for r in
            load(spark, SF, "documents")
            .select("doc_id", tokens(F.col("text")).alias("toks"))
            .collect()}
    # every retrieved doc shares at least one term with its query's
    # first-8-token prompt (BM25 only scores postings of query terms),
    # and retrieved docs are never query docs (corpus excludes them)
    for h in hits:
        assert h.doc_id % 13 != 0
        prompt = set(toks[h.query_id][:8])
        assert prompt & set(toks[h.doc_id]), (h.query_id, h.doc_id)


def test_oov_rate_consistent_with_vocab(spark):
    from sc_crawler_spark.queries.pipeline import (
        _OOV_VOCAB_K, doc_oov_rate)

    rows = doc_oov_rate(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-4
    # with a 31-term vocabulary and K=16, some docs must carry OOV
    # tokens and none can be fully OOV (top-16 covers common tokens)
    assert any(r.n_oov > 0 for r in rows)
    assert all(r.n_oov < r.n_tokens for r in rows)
