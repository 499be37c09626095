"""Tokenizer-aware sequence packing for pretraining batches.

Greedy first-fit-in-order packing of documents into fixed token-budget
sequences — the step that turns a filtered corpus into dense training
rows. Sequence assignment is a prefix-scan WITH RESETS (a new bin opens
when the running total would overflow), which no window function
expresses; this is the applyInPandas tier of the custom-operator
ladder (composition -> applyInPandas -> mapPartitions): per-shard
Arrow-batched pandas, linear in docs.

Scale story: docs are hash-sharded up front (``doc_id % n_shards``) and
each shard packs independently — parallelism is the shard count, and a
shard only ever holds (id, token-count) pairs, never text, so memory
per task is ~16 bytes/doc. Packing quality loses nothing measurable:
first-fit-in-order on shuffled ids is the standard production choice
(bin-packing optimality is NP-hard and irrelevant at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, id_col: str, tokens_col: str,
                   budget: int, n_shards: int = 8) -> DataFrame:
    """Assign each doc to a (shard, seq_idx) bin: scanning docs in
    ``id_col`` order within a shard, a doc joins the open sequence when
    it fits, else opens the next one. Docs with ``n_tokens >= budget``
    take a sequence of their own and are flagged ``truncated`` (the
    trainer clips them at the budget).

    Output: one row per doc — (shard, seq_idx, doc_id, n_tokens,
    truncated); deterministic for a given (corpus, budget, n_shards).
    """

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        shard = int(pdf["shard"].iloc[0])
        seqs, toks, trunc = [], [], []
        seq, acc = 0, 0
        for nt in pdf[tokens_col]:
            nt = int(nt)
            if nt >= budget:
                if acc > 0:
                    seq += 1
                seqs.append(seq); toks.append(nt); trunc.append(True)
                seq += 1
                acc = 0
            else:
                if acc + nt > budget:
                    seq += 1
                    acc = 0
                seqs.append(seq); toks.append(nt); trunc.append(False)
                acc += nt
        return pd.DataFrame({
            "shard": shard, "seq_idx": seqs,
            "doc_id": pdf[id_col].astype("int64").values,
            "n_tokens": toks, "truncated": trunc,
        })

    sharded = docs.select(
        F.col(id_col), F.col(tokens_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandas(
        pack,
        "shard long, seq_idx long, doc_id long, n_tokens long, "
        "truncated boolean",
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence roll-up: doc count, token total, fill ratio."""
    return packed.groupBy("shard", "seq_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.least(F.sum("n_tokens"), F.lit(budget)) / F.lit(float(budget)))
        .alias("fill_ratio"),
    )


def shard_assignment(df: DataFrame, id_col: str, n_shards: int,
                     seed: int = 0) -> DataFrame:
    """Seeded GLOBAL SHUFFLE for training-shard writes: adds ``shard``
    (which output shard a row lands in) and ``sort_key`` (its order
    within the shard).

    shard = first 8 md5 hex digits of ``"<seed>|<id>"`` mod n_shards;
    sort_key = the full digest. md5 on a string is engine-portable, so
    the assignment is reproducible anywhere (and DuckDB-oracle-checkable)
    — unlike ``rand(seed)``, which is partitioning-dependent, or
    ``hash()``, which is Spark-private. Changing the seed reshuffles
    every epoch deterministically.
    """
    h = F.md5(F.concat_ws("|", F.lit(str(seed)),
                          F.col(id_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    return df.withColumn("shard", shard.cast("int")).withColumn("sort_key", h)


def write_training_shards(df: DataFrame, out: str, id_col: str,
                          n_shards: int, seed: int = 0) -> None:
    """Materialize a training corpus as ``out/shard=K/`` parquet dirs:
    seeded global shuffle, one file per shard, rows ordered by sort_key.

    One shuffle total: ``repartition(n_shards, shard)`` routes every row
    of a shard to one task (shards may share a task — partitionBy still
    splits them into their own directories), and the within-task sort
    gives each shard file the seeded order. At 100 TB you raise
    n_shards, never the per-task volume.
    """
    (
        shard_assignment(df, id_col, n_shards, seed)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key")
        .write.partitionBy("shard").mode("overwrite").parquet(out)
    )
