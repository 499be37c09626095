"""Sequence-packing invariants (operators/packing.py). No SQL oracle
exists for a prefix-scan with resets, so correctness is pinned against
a local Python re-implementation of the same greedy rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from sc_crawler_spark.operators.packing import pack_sequences, packing_stats
from sc_crawler_spark.queries.curation import pack_sequences_docs

SF = "/root/testdata/sf0.01"
BUDGET = 256


def _local_pack(pairs, budget):
    """Reference greedy first-fit-in-order packer over (id, n) pairs."""
    out = {}
    seq, acc = 0, 0
    for did, nt in sorted(pairs):
        if nt >= budget:
            if acc > 0:
                seq += 1
            out[did] = (seq, True)
            seq, acc = seq + 1, 0
        else:
            if acc + nt > budget:
                seq, acc = seq + 1, 0
            out[did] = (seq, False)
            acc += nt
    return out


def test_packing_matches_local_reference(spark):
    packed = pack_sequences_docs(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(packed) == n_docs  # every doc packed exactly once
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(8))
    for shard, rows in by_shard.items():
        expect = _local_pack([(r["doc_id"], r["n_tokens"]) for r in rows],
                             BUDGET)
        for r in rows:
            assert (r["seq_idx"], r["truncated"]) == expect[r["doc_id"]], (
                shard, r["doc_id"])


def test_packing_budget_and_stats(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(6)] + [(6, 999)],
        "doc_id long, n_tokens long")
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=256, n_shards=1)
    stats = {r["seq_idx"]: r for r in
             packing_stats(packed, 256).collect()}
    # 100+100 fits, third 100 overflows -> [0,1]=seq0, [2,3]=seq1,
    # [4,5]=seq2, oversize 999 alone in seq3
    totals = {k: v["total_tokens"] for k, v in stats.items()}
    assert totals == {0: 200, 1: 200, 2: 200, 3: 999}
    assert all(v["total_tokens"] <= 256 for k, v in stats.items() if k != 3)
    assert stats[3]["n_docs"] == 1 and stats[3]["fill_ratio"] == 1.0
    tr = {r["doc_id"]: r["truncated"] for r in packed.collect()}
    assert tr[6] is True and not any(tr[i] for i in range(6))


def test_packing_deterministic(spark):
    a = sorted(map(tuple, pack_sequences_docs(spark, SF).collect()))
    b = sorted(map(tuple, pack_sequences_docs(spark, SF).collect()))
    assert a == b


def test_shard_assignment_covers_and_balances(spark):
    from sc_crawler_spark.operators.packing import shard_assignment

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = shard_assignment(docs, "doc_id", 16, seed=3)
    rows = a.groupBy("shard").count().collect()
    counts = {r["shard"]: r["count"] for r in rows}
    assert set(counts) == set(range(16))          # every shard hit
    mean = 2000 / 16
    assert all(0.5 * mean < c < 1.5 * mean for c in counts.values())
    # different seed => different placement for most rows
    b = shard_assignment(docs, "doc_id", 16, seed=4)
    moved = (
        a.select("doc_id", "shard")
        .join(b.select("doc_id", F.col("shard").alias("s2")), "doc_id")
        .filter("shard != s2").count()
    )
    assert moved > 1500


def test_write_training_shards_roundtrip(spark, tmp_path):
    from sc_crawler_spark.operators.packing import write_training_shards

    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("doc "), F.col("doc_id")))
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", n_shards=8, seed=1)

    back = spark.read.parquet(out)
    # every doc exactly once, shard dirs materialized, order column kept
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
    assert back.select("shard").distinct().count() == 8
    import glob
    for k in range(8):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)    # one file per shard
    # determinism: a rewrite with the same seed lands identical shards
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, "doc_id", n_shards=8, seed=1)
    a = sorted(map(tuple, back.select("doc_id", "shard").collect()))
    b2 = sorted(map(tuple,
                    spark.read.parquet(out2).select("doc_id", "shard").collect()))
    assert a == b2
