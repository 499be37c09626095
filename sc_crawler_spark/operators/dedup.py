"""Deduplication operators for the training-data pipeline.

Four families, all shuffle-conscious:

- exact            — hash-groupBy on a content digest (one shuffle).
- n-gram Jaccard   — shingle self-join with blocking keys; exact
  similarity, quadratic only within blocks.
- MinHash + LSH    — shingle -> minhash signature -> banded bucket join;
  candidate pairs verified with true Jaccard. The scale path: cost is
  O(docs x bands), never all-pairs.
- SimHash          — 32-bit sign-aggregated token hash; near-dups share a
  band chunk and differ in <= k bits.

Hash parity: engines hash with MD5 over seeded strings; min/compare on the
fixed-width hex string equals min on the integer value, so the DuckDB
oracle can mirror every step with identical results (no engine-specific
hash functions in the contract).

PIPELINE ORDER MATTERS AT SCALE: run :func:`exact_dedup` BEFORE any
near-dup tier. LSH/SimHash candidate counts are sum(n_b^2) over bucket
sizes, and identical documents always share every bucket — so a corpus
with d copies of a doc contributes d^2/2 candidate pairs PER DUPLICATED
DOC, which is the true-pair lower bound (every identical pair IS a
near-dup), not an artifact. Measured: a 512x-cloned stress corpus
(~2.5M docs, each text x512) drives the banded join toward ~6x10^8
pairs and OOMs an 8 GB local JVM; the same corpus exact-deduped first
collapses to ~5k distinct docs and the near-dup tiers are trivial.
This mirrors production practice (CCNet/Gopher dedup exact/hash first,
then MinHash) and is how `training_set_select` composes the tiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import dround
from ..functions.text import shingles_from_tokens, tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest id per identical content digest.
    Returns (id, content_sha, n_copies) for survivors."""
    h = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
    return h.groupBy("content_sha").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )


def duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                    width: int = 40, stride: int = 1,
                    digest_key: bool = False) -> DataFrame:
    """Substring-level exact dedup: per document, the maximal character
    spans whose every ``width``-char window also appears in ANOTHER
    document (the cross-document duplicated-span semantic of the
    suffix-array dedup literature, re-expressed as a bucketed Spark
    plan — no suffix array is ever materialized).

    Reference parity: the reference engine has no substring-span
    operator; this extends the dedup family (reference-inspired scope:
    training-data curation, r7 verdict item 4).

    Plan (two shuffles, both key-hashed — no all-pairs stage):

    1. explode each doc into rolling ``width``-char windows every
       ``stride`` chars (zero-shuffle explode, same discipline as
       chunk_docs — operators/chunking.py:22);
    2. ONE window pass partitioned by the span text marks windows seen
       in >= 2 distinct docs via ``min(id) != max(id)`` — constant
       memory per key, no collect_set, no join-back;
    3. ONE doc-keyed exchange merges surviving window starts into
       maximal spans (gaps-and-islands: a break where the next start
       exceeds previous start + width) — the island groupBy and the
       final per-doc rollup reuse the same hash distribution, so
       neither re-shuffles.

    100 TB config: ``stride=width//2`` cuts the exploded row count 20x
    at the cost of span-boundary resolution, and ``digest_key=True``
    makes step 2's partition key a 128-bit ``md5`` digest of the window
    instead of its text, shrinking the span-shuffle row from ``width``
    bytes to 32 hex chars (and to 16 raw bytes with unhex, if width
    grows) — both knobs, not defaults, because the sf-scale oracle
    contract wants exact text-keyed boundaries (digest results are
    identical absent md5 collisions). Documents beyond ~1 MB should
    pass through chunk_docs first so the per-row window array stays
    bounded.

    Returns one row per document that contains at least one duplicated
    span: (id, n_dup_spans, dup_chars, max_span_chars).
    """
    dup = _cross_doc_window_marks(df, text_col, id_col, width, stride,
                                  digest_key)
    return _merge_span_islands(dup, id_col, width, "n_dup_spans",
                               "dup_chars", "max_span_chars")


def _cross_doc_window_marks(df: DataFrame, text_col: str, id_col: str,
                            width: int, stride: int,
                            digest_key: bool) -> DataFrame:
    """Steps 1-2 of the span pipeline (shared by duplicate_spans and
    remove_duplicate_spans): rolling windows -> span-keyed window pass
    marking windows seen in >= 2 distinct docs. Returns (id, pos)."""
    from pyspark.sql import Window

    spans = (
        df.filter(F.length(text_col) >= width)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1),
                           F.length(text_col) - F.lit(width - 1),
                           F.lit(stride))).alias("pos"),
            F.col(text_col),
        )
        .select(id_col, "pos",
                F.expr(f"substring({text_col}, pos, {width})").alias("span"))
    )
    if digest_key:
        spans = spans.select(id_col, "pos", F.md5("span").alias("span"))
    w_span = Window.partitionBy("span")
    return (
        spans.withColumn(
            "is_dup",
            F.min(id_col).over(w_span) != F.max(id_col).over(w_span))
        .filter(F.col("is_dup"))
        .select(id_col, "pos")
    )


def remove_duplicate_spans(df: DataFrame, text_col: str, id_col: str,
                           width: int = 40, stride: int = 1,
                           digest_key: bool = False) -> DataFrame:
    """The ACTION form of :func:`duplicate_spans` (r9 verdict task 4):
    cut every cross-document duplicated span out of each document and
    return the cleaned corpus — what the suffix-array dedup pipelines
    exist to produce, not just report.

    Plan = duplicate_spans' two key-hashed shuffles plus one doc-keyed
    join back to the corpus (same hash distribution as the islands
    merge, so the join does not add an exchange for the span side) and
    a JVM-side ``aggregate`` over each doc's sorted span list that
    stitches the kept segments together — no Python UDF, no per-row
    driver work. Maximal islands are non-overlapping by construction
    (adjacent islands are separated by a break of > ``width``), so the
    segment arithmetic never goes negative; ``greatest(0, ...)`` guards
    the stride>1 approximation anyway.

    100 TB: the added join ships only (id, spans-array) — O(docs with
    duplication), not O(windows) — and the reconstruction is linear in
    document length. The same ``stride``/``digest_key`` knobs apply.

    Returns every input document: (id, clean_text, removed_chars),
    with removed_chars == duplicate_spans' dup_chars for spanned docs
    and 0 for untouched ones.
    """
    dup = _cross_doc_window_marks(df, text_col, id_col, width, stride,
                                  digest_key)
    per_span = _span_islands(dup, id_col, width)
    spans_per_doc = per_span.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans"))

    text = F.col(text_col)
    joined = df.join(spans_per_doc, id_col, "left")

    def _cut(acc, s):
        keep_len = F.greatest(F.lit(0),
                              s.span_start - acc.prev - F.lit(1))
        return F.struct(
            F.concat(acc.acc,
                     F.substr(text, acc.prev + F.lit(1), keep_len))
            .alias("acc"),
            s.span_end.alias("prev"))

    rebuilt = F.aggregate(
        F.col("_spans"),
        F.struct(F.lit("").alias("acc"), F.lit(0).alias("prev")),
        _cut,
        lambda a: F.concat(
            a.acc,
            F.substr(text, a.prev + F.lit(1),
                     F.greatest(F.lit(0), F.length(text) - a.prev))))
    clean = F.when(F.col("_spans").isNull(), text).otherwise(rebuilt)
    return (
        joined.withColumn("clean_text", clean)
        .select(
            id_col, "clean_text",
            (F.length(text) - F.length("clean_text"))
            .cast("bigint").alias("removed_chars"))
    )


def _span_islands(marked: DataFrame, id_col: str, width: int) -> DataFrame:
    """Gaps-and-islands core shared by the span operators: marked
    window starts (id, pos) -> maximal covered spans (id, span_start,
    span_end). One doc-keyed exchange; the island groupBy reuses its
    hash distribution (subset-key clustering)."""
    from pyspark.sql import Window

    w_doc = Window.partitionBy(id_col).orderBy("pos")
    isl = (
        marked.withColumn("_prev", F.lag("pos").over(w_doc))
        .withColumn(
            "_brk",
            F.when(F.col("pos") - F.col("_prev") > width, 1).otherwise(0))
        .withColumn(
            "island",
            F.sum("_brk").over(
                w_doc.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return isl.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(width - 1)).alias("span_end"),
    )


def _merge_span_islands(marked: DataFrame, id_col: str, width: int,
                        n_alias: str, chars_alias: str,
                        max_alias: str) -> DataFrame:
    """Per-doc stats rollup over :func:`_span_islands` (the reporting
    span operators); the final groupBy reuses the islands' doc-keyed
    hash distribution, so no extra exchange."""
    per_span = _span_islands(marked, id_col, width)
    return per_span.groupBy(id_col).agg(
        F.count("*").alias(n_alias),
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .alias(chars_alias),
        F.max(F.col("span_end") - F.col("span_start") + 1)
        .alias(max_alias),
    )


def contaminated_spans(train: DataFrame, eval_df: DataFrame,
                       text_col: str, id_col: str, width: int = 40,
                       stride: int = 1) -> DataFrame:
    """Substring-level benchmark decontamination (the span-based
    contamination check from the public dedup literature — the
    n-gram semi-join's exact-boundary big sibling): per TRAIN document,
    the maximal character spans whose every ``width``-char window also
    occurs ANYWHERE in the EVAL corpus.

    Same two-shuffle discipline as :func:`duplicate_spans`: both
    corpora explode into rolling windows tagged by side, ONE window
    pass partitioned by the span text marks train windows whose
    partition also holds an eval window (``max(is_eval)`` — constant
    memory, no join-back), and the shared gaps-and-islands merge emits
    per-doc contaminated-span stats. The eval side ships only (span,
    tag) rows — no ids, no positions — so the span shuffle stays
    narrow even when the eval corpus is large.

    Returns (id, n_contaminated_spans, contaminated_chars,
    max_span_chars) for every train doc carrying eval text."""
    from pyspark.sql import Window

    def windows(df, keep_id: bool):
        w = (
            df.filter(F.length(text_col) >= width)
            .select(
                *( [F.col(id_col)] if keep_id else [] ),
                F.explode(
                    F.sequence(F.lit(1),
                               F.length(text_col) - F.lit(width - 1),
                               F.lit(stride))).alias("pos"),
                F.col(text_col),
            )
            .select(
                *( [id_col, "pos"] if keep_id else [] ),
                F.expr(f"substring({text_col}, pos, {width})")
                .alias("span"))
        )
        return w

    id_type = train.schema[id_col].dataType.simpleString()
    tw = windows(train, True).withColumn("is_eval", F.lit(0))
    ew = (windows(eval_df, False)
          .select(F.lit(None).cast(id_type).alias(id_col),
                  F.lit(None).cast("int").alias("pos"), "span",
                  F.lit(1).alias("is_eval")))
    w_span = Window.partitionBy("span")
    marked = (
        tw.select(id_col, F.col("pos").cast("int").alias("pos"), "span",
                  "is_eval")
        .unionByName(ew)
        .withColumn("_hit", F.max("is_eval").over(w_span))
        .filter((F.col("is_eval") == 0) & (F.col("_hit") == 1))
        .select(id_col, "pos")
    )
    return _merge_span_islands(marked, id_col, width,
                               "n_contaminated_spans",
                               "contaminated_chars", "max_span_chars")


def doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3,
                 extra_cols: list[str] | None = None) -> DataFrame:
    """(id, shingles: array<string>) — tokens materialized first so the
    split isn't re-evaluated per shingle (see shingles_from_tokens).

    Repartitions on the id ONLY when the source parallelism is too low
    (fewer partitions than cores): corpora that arrive as one or two
    parquet files would pin the tokenize/shingle compute to as many
    tasks, and there the raw-text shuffle is cheap next to serial
    hashing. A corpus already split across >= cores files (the normal
    lake layout) skips the shuffle outright — at 64x the unconditional
    repartition moved ~1 GB of raw text for nothing (r17), and at
    100 TB it would be a full-corpus exchange.
    """
    keep = [F.col(id_col)] + [F.col(c) for c in (extra_cols or [])]
    src = df
    try:
        if df.rdd.getNumPartitions() < df.sparkSession.sparkContext \
                .defaultParallelism:
            src = df.repartition(F.col(id_col))
    except Exception:
        src = df.repartition(F.col(id_col))
    toked = src.select(
        *keep, tokens(F.col(text_col)).alias("_toks")
    )
    return toked.select(
        *[c for c in (id_col, *(extra_cols or []))],
        shingles_from_tokens(F.col("_toks"), k).alias("shingles"),
    )


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct k-word shingles, plus per-doc
    shingle count for Jaccard denominators."""
    sh = doc_shingles(df, text_col, id_col, k).withColumn(
        "n_shingles", F.size("shingles")
    )
    return sh.select(id_col, "n_shingles", F.explode("shingles").alias("shingle"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        k: int = 3, threshold: float = 0.8,
                        block_col: str | None = None,
                        max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Self-join on the shingle value — only documents sharing at least one
    shingle ever pair up, and an optional block column (e.g. language)
    bounds the join further. Output jaccard rounded to 6 for stability.

    ``max_df`` is the scale guard: shingles appearing in more than
    ``max_df`` distinct documents are excluded from candidate GENERATION
    (one boilerplate shingle shared by k docs otherwise makes a k² join
    bucket — the standard exact-Jaccard document-frequency blocking
    trick). Verification still uses the FULL shingle sets, so reported
    jaccard values are exact; only pairs whose every common shingle is
    hotter than ``max_df`` are missed, and such pairs are boilerplate
    overlap by definition. With ``max_df=None`` the join is unblocked
    (exact recall, quadratic risk on hot shingles).
    """
    if max_df is not None:
        return _ngram_jaccard_capped(df, text_col, id_col, k, threshold,
                                     block_col, max_df)
    sh = shingle_table(df, text_col, id_col, k)
    cols_a = [F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"),
              F.col("shingle")]
    cols_b = [F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"),
              F.col("shingle")]
    if block_col:
        blocks = df.select(F.col(id_col), F.col(block_col))
        sh = sh.join(blocks, id_col)
        cols_a.append(F.col(block_col).alias("block_a"))
        cols_b.append(F.col(block_col).alias("block_b"))
    a = sh.select(*cols_a)
    b = sh.select(*cols_b)
    on = [a.shingle == b.shingle, a.id_a < b.id_b]
    if block_col:
        on.append(F.col("block_a") == F.col("block_b"))
    common = (
        a.join(b, on)
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.withColumn("jaccard", dround(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def rare_shingle_candidates(sh: DataFrame, id_col: str,
                            block_col: str | None,
                            max_df: int | None) -> DataFrame:
    """Candidate (id_a, id_b) pairs from an exploded (id[, block], shingle)
    table, pairing only on shingles with document frequency <= max_df
    (``max_df=None`` skips the cap — exact recall, quadratic risk on
    hot shingles).

    The hot-shingle list is a heavy-hitter aggregate (tiny by
    construction — at most |corpus|/max_df entries can exceed the cap),
    so the anti-join broadcasts under AQE; the self-join's per-shingle
    bucket size is bounded by max_df, keeping the candidate count
    <= n_shingles * max_df² instead of worst-case |docs|².
    """
    if max_df is None:
        rare = sh
    else:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count_distinct(F.col(id_col)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("shingle")
        )
        rare = sh.join(hot, "shingle", "left_anti")
    cols_a = [F.col(id_col).alias("id_a"), F.col("shingle")]
    cols_b = [F.col(id_col).alias("id_b"), F.col("shingle")]
    if block_col:
        cols_a.append(F.col(block_col).alias("block_a"))
        cols_b.append(F.col(block_col).alias("block_b"))
    a = rare.select(*cols_a)
    b = rare.select(*cols_b)
    on = [a.shingle == b.shingle, F.col("id_a") < F.col("id_b")]
    if block_col:
        on.append(F.col("block_a") == F.col("block_b"))
    return a.join(b, on).select("id_a", "id_b").distinct()


def _verified_shingle_pairs(df: DataFrame, text_col: str, id_col: str,
                            k: int, threshold: float,
                            block_col: str | None, max_df: int | None,
                            score_name: str, score_fn) -> DataFrame:
    """Shared scaffold for set-similarity dedup: shingle once (cached —
    two consumers), candidate pairs from the (optionally df-capped)
    shingle self-join, then verify each sparse candidate against the
    two docs' full DISTINCT shingle arrays. ``score_fn(n_common, n_a,
    n_b) -> Column`` is the only thing that differs between Jaccard
    and containment (same sparse-candidate verify shape as
    minhash_lsh_pairs)."""
    extra = [block_col] if block_col else []
    shing = doc_shingles(df, text_col, id_col, k, extra_cols=extra).cache()
    sh = shing.select(F.col(id_col), *extra,
                      F.explode("shingles").alias("shingle"))
    cand = rare_shingle_candidates(sh, id_col, block_col, max_df)
    sh_a = shing.select(F.col(id_col).alias("id_a"),
                        F.col("shingles").alias("sh_a"))
    sh_b = shing.select(F.col(id_col).alias("id_b"),
                        F.col("shingles").alias("sh_b"))
    paired = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    score = score_fn(n_common, F.size("sh_a"), F.size("sh_b"))
    return (
        paired.withColumn(score_name, dround(score, 6))
        .filter(F.col(score_name) >= threshold)
        .select("id_a", "id_b", score_name)
    )


def _ngram_jaccard_capped(df: DataFrame, text_col: str, id_col: str,
                          k: int, threshold: float,
                          block_col: str | None, max_df: int) -> DataFrame:
    """df-capped path: rare-shingle candidate join, then exact Jaccard
    verification over the full shingle sets."""
    return _verified_shingle_pairs(
        df, text_col, id_col, k, threshold, block_col, max_df,
        "jaccard", lambda nc, na, nb: nc / (na + nb - nc))


def _containment_verify(shing: "DataFrame", cand: "DataFrame",
                        id_col: str, threshold: float,
                        max_ratio: float | None = None) -> "DataFrame":
    """EXACT overlap-coefficient verification of a sparse candidate
    set: two id-joins ship only the candidate docs' shingle arrays,
    array_intersect computes |A∩B| JVM-side. Shared tail of both
    banded containment arms — whatever generated the candidates, the
    emitted score is exact. ``max_ratio`` applies the size-envelope
    gate HERE, where both sizes are already in hand, instead of
    shipping a per-band size column through the (docs x bands) table —
    at 512x docs that join alone shuffled 164M rows."""
    sh_a = shing.select(F.col(id_col).alias("id_a"),
                        F.col("shingles").alias("sh_a"))
    sh_b = shing.select(F.col(id_col).alias("id_b"),
                        F.col("shingles").alias("sh_b"))
    paired = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    if max_ratio is not None:
        paired = paired.filter(
            F.greatest(F.size("sh_a"), F.size("sh_b"))
            <= F.lit(max_ratio) * F.least(F.size("sh_a"), F.size("sh_b")))
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    score = n_common / F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        paired.withColumn("containment", dround(score, 6))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def _ensemble_band_plan(threshold: float, max_ratio: float,
                        n_hashes: int, min_bands: int,
                        target: float = 0.99) -> list[int]:
    """Per-partition-distance band counts for the probe-form LSH
    Ensemble arm (Zhu et al., VLDB 2016: the size partition lets the
    banding track the containment->jaccard mapping instead of one
    fixed s-curve).

    Docs sit in power-of-2 size partitions p = floor(log2(|set|)); a
    pair at partition distance d has size ratio in (2^(d-1), 2^(d+1)),
    so within the declared ``max_ratio`` envelope its worst-case ratio
    is min(2^(d+1), max_ratio) and its jaccard floor is
    j(d) = t / (1 + r_edge - t). Entry d of the returned list is the
    smallest band count n <= n_hashes whose >=``min_bands``-collision
    vote recalls at ``target`` probability on j(d) (clamped to
    n_hashes when even all bands fall short — at the defaults d=2/3
    sit at ~0.989, the r13 arm's own operating point). Defaults
    (t=0.8, ratio 8, 64 hashes, vote 2) -> [16, 32, 64, 64]: a
    same-partition near-clone pair needs only 16 probed bands for the
    same recall the r13 form bought with all 64."""
    import math

    d_max = max(0, math.ceil(math.log2(max_ratio)))
    plan = []
    for d in range(d_max + 1):
        r_edge = min(float(2 ** (d + 1)), float(max_ratio))
        j = threshold / (1.0 + r_edge - threshold)
        n_need = n_hashes
        for n in range(min_bands, n_hashes + 1):
            # P[Binom(n, j) >= min_bands]
            p_lt = sum(math.comb(n, i) * (j ** i) * ((1 - j) ** (n - i))
                       for i in range(min_bands))
            if 1.0 - p_lt >= target:
                n_need = n
                break
        plan.append(n_need)
    return plan


def containment_pairs(df: "DataFrame", text_col: str, id_col: str,
                      k: int = 3, threshold: float = 0.8,
                      block_col: str | None = None,
                      max_df: int | None = None,
                      band_prefilter: bool = False,
                      n_hashes: int = 16, band_rows: int = 2,
                      size_partitioned: bool = False,
                      max_ratio: float = 8.0,
                      max_bucket: int | None = 64,
                      min_bands: int = 2) -> "DataFrame":
    """Overlap-coefficient (containment) near-dup pairs:
    |A∩B| / min(|A|,|B|) >= threshold, id_a < id_b.

    The asymmetric complement of Jaccard: a document whose shingle set
    is a SUBSET of a larger one (truncated copy, quote-with-additions,
    article-inside-digest) scores containment 1.0 while its Jaccard can
    be arbitrarily low — Jaccard-only dedup keeps exactly these
    near-supersets. Shares the Jaccard path's scaffold
    (_verified_shingle_pairs: rare-shingle blocking under ``max_df``,
    full-set verification via array_intersect on sparse candidates);
    only the denominator changes.

    ``band_prefilter=True`` is the adversarial-scale knob: candidate
    pairs come from MinHash-LSH band buckets (``n_hashes`` minhashes,
    bands of ``band_rows``) instead of the rare-shingle self-join, and
    the reported containment is still EXACT (full-set verify). The
    rare-shingle join's cost scales with the number of near-clone
    documents even when ``max_df`` bounds each bucket — on a corpus of
    bijectively-ciphered near-clones (every copy distinct, so the exact
    tier removes nothing) it is the one remaining quadratic-ish path.
    Banding makes candidate generation O(docs x bands) with per-bucket
    fan-out bounded by true near-duplicate density. The trade, pinned
    by tests/test_properties.py::test_containment_band_prefilter_recall:
    candidates recall by JACCARD s-curve (at the defaults, >=99% for
    near-size pairs with containment >= 0.8, i.e. jaccard >= 0.67), so
    HIGHLY asymmetric subset pairs (|A| << |B|, jaccard ~ |A|/|B|) can
    be missed — for those use ``size_partitioned=True`` below, or the
    exact arm.

    ``size_partitioned=True`` is the LSH-Ensemble-style construction
    (Zhu et al., VLDB 2016: size-partitioned indexes let the band
    config track the containment->jaccard mapping instead of one fixed
    s-curve) closing that asymmetric blind spot: single-row bands
    (``band_rows`` must be 1; pass a larger ``n_hashes``, e.g. 64), a
    size-ratio envelope ``max_ratio``, and a ``min_bands`` vote. A
    subset pair A ⊆ B at containment t has jaccard
    >= t/(1 + ratio - t); at t=0.8, ratio=8, that is j >= 0.098, and
    with 64 single-row bands the probability of colliding in >=
    ``min_bands``=2 of them is ~0.99 — vs ≈0 for the 2-row banding at
    that ratio. Three cost levers, each with a stated recall trade
    (pinned by tests/test_properties.py::
    test_containment_size_partitioned_subset_recall):

    - ``min_bands``: single-band collisions fire for ANY shared
      shingle whose hash wins both minima (P ≈ n_hashes·j even at
      background similarity), so requiring >= 2 colliding bands cuts
      background candidates ~10-20x while costing a ratio-8 subset
      pair ~1% recall (measured at 512x docs: >=1 band -> 178M
      exact verifies, OOM in an 8 GB local JVM; >=2 -> the arm
      completes); pairs asymmetric beyond ``max_ratio`` lose the
      >=0.95 guarantee first (ratio 16 at min_bands=2: ~0.83).
    - ``max_bucket``: drops band buckets holding more docs than the
      cap — the max_df discipline applied to LSH buckets; a
      globally-common shingle otherwise creates one quadratic bucket.
      A true pair loses recall only if EVERY colliding band is hot.
    - ``max_ratio``: the declared asymmetry envelope, enforced in the
      exact verify (both sizes are in hand there — shipping sizes
      through the (docs x bands) table costs a 164M-row shuffle at
      512x).

    The arm exists for corpora where the EXACT rare-shingle arm's
    blocking join is itself the bottleneck (ciphered near-clones);
    on ordinary corpora the exact arm already recalls subset pairs
    at ANY asymmetry — rare-shingle blocking keys on shingles, not
    jaccard — and stays the default."""
    if size_partitioned:
        if band_rows != 1:
            raise ValueError(
                "containment_pairs: size_partitioned=True requires "
                f"band_rows=1 (got {band_rows}) — the asymmetric "
                "recall math above assumes single-hash bands")
        from pyspark.storagelevel import StorageLevel

        extra = [block_col] if block_col else []
        # Memory discipline, learned at 512x docs in one 8 GB local
        # JVM: cache ONLY the narrow signature table (n_hashes longs a
        # doc, spill-friendly) — caching the multi-GB shingle arrays
        # alongside the 64-hash signature evaluation GC-thrashed the
        # heap to death. The verify tail re-shingles its two sparse
        # candidate sides instead (shingling is one cheap text pass;
        # at 100 TB the shingle table lands bronze anyway).
        shing = doc_shingles(df, text_col, id_col, k, extra_cols=extra)
        # r14 (r13 verdict task 5): the per-PARTITION probe form of
        # LSH Ensemble. Every doc carries its power-of-2 size
        # partition _sp = floor(log2(|shingles|)); a qualifying pair
        # (ratio <= max_ratio) sits within ceil(log2(max_ratio))
        # partition distance, and the number of single-row bands that
        # must collide to recall it at `threshold` SHRINKS as the
        # partitions get closer (the containment->jaccard floor
        # rises). _ensemble_band_plan computes, per distance d, the
        # minimal band count hitting ~0.99 recall at that distance's
        # envelope-edge ratio — [16, 32, 64, 64] at the defaults — and
        # the bucket join only KEEPS a collision if its band index is
        # inside the plan for the pair's actual distance. vs the r13
        # all-bands form this cuts same-partition collision mass 4x
        # (near-size clone corpora put almost everything there),
        # drops cross-partition pairs beyond the envelope BEFORE the
        # vote shuffle and the verify (previously they died in the
        # verify, after shipping), and leaves true-pair recall at the
        # same ~0.99 the r13 math claimed — measured A/B in PLANS.md
        # r14.
        sig = _fast_signatures_from_shingles(
            shing.withColumn(
                "_sp", F.floor(F.log2(
                    F.greatest(F.size("shingles"), F.lit(1))
                    .cast("double"))).cast("int")),
            id_col, n_hashes, extra_cols=[*extra, "_sp"],
        ).persist(StorageLevel.MEMORY_AND_DISK)
        bands = _band_table(sig, id_col, n_hashes, 1,
                            extra_cols=[*extra, "_sp"])
        join_keys = ["band", "sig"] + extra
        if max_bucket is not None:
            ok = (bands.groupBy(*join_keys)
                  .agg(F.count("*").alias("_bn"))
                  .filter(F.col("_bn") <= max_bucket)
                  .drop("_bn"))
            bands = bands.join(ok, join_keys)
        plan = _ensemble_band_plan(threshold, max_ratio, n_hashes,
                                   min_bands)
        max_d = len(plan) - 1
        nbd = F.array(*[F.lit(n) for n in plan])
        left = bands.select(F.col(id_col).alias("id_a"),
                            F.col("_sp").alias("_spa"), *join_keys)
        right = bands.select(F.col(id_col).alias("id_b"),
                             F.col("_sp").alias("_spb"), *join_keys)
        d = F.col("_spb") - F.col("_spa")
        pair_rows = (
            left.join(right, join_keys)
            # one orientation per pair: ascending partition, id as the
            # same-partition tiebreak (sizes are symmetric there)
            .filter((d > 0) | ((d == 0) & (F.col("id_a") < F.col("id_b"))))
            # envelope + per-distance band plan: a collision counts
            # only if its band index is one this distance PROBES
            .filter((d <= max_d)
                    & (F.col("band") < F.element_at(nbd, d + 1)))
            .select(F.least("id_a", "id_b").alias("id_a"),
                    F.greatest("id_a", "id_b").alias("id_b"))
        )
        # min_bands vote replaces the plain distinct: same shuffle key,
        # one extra count per pair, an order of magnitude fewer arrays
        # shipped into the exact verify
        cand = (pair_rows.groupBy("id_a", "id_b")
                .agg(F.count("*").alias("_nb"))
                .filter(F.col("_nb") >= min_bands)
                .select("id_a", "id_b"))
        return _containment_verify(shing, cand, id_col, threshold,
                                   max_ratio=max_ratio)
    if band_prefilter:
        if band_rows <= 0 or n_hashes % band_rows != 0:
            raise ValueError(
                f"containment_pairs: band_rows={band_rows} must divide "
                f"n_hashes={n_hashes}")
        extra = [block_col] if block_col else []
        shing = doc_shingles(df, text_col, id_col, k,
                             extra_cols=extra).cache()
        # Prefilter-only signature: xxhash64 minima computed per-doc by
        # array_min(transform(...)) — zero explode, zero shuffle, pure
        # codegen — NOT the md5 convention _signatures_from_shingles
        # uses (that one is pinned by the minhash oracle + the landed
        # index format). Measured at 512x docs: the md5 agg path costs
        # ~170 s for the signature alone; this path runs the whole
        # banded pipeline in ~38 s. Cached because the band table feeds
        # both sides of the candidate self-join.
        sig = _fast_signatures_from_shingles(shing, id_col, n_hashes).cache()
        bands = _band_table(sig, id_col, n_hashes, band_rows)
        if block_col:
            # block inequality can never pair — fold it into the bucket
            # key so cross-block collisions don't even become candidates
            bands = bands.join(shing.select(id_col, block_col), id_col)
        join_keys = ["band", "sig"] + ([block_col] if block_col else [])
        left = bands.select(F.col(id_col).alias("id_a"), *join_keys)
        right = bands.select(F.col(id_col).alias("id_b"), *join_keys)
        cand = (
            left.join(right, join_keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return _containment_verify(shing, cand, id_col, threshold)
    return _verified_shingle_pairs(
        df, text_col, id_col, k, threshold, block_col, max_df,
        "containment", lambda nc, na, nb: nc / F.least(na, nb))


def _fast_signatures_from_shingles(shingles: DataFrame, id_col: str,
                                   n_hashes: int,
                                   extra_cols: tuple = ()) -> DataFrame:
    """xxhash64 MinHash signature computed per-doc by
    ``array_min(transform(shingles, xxhash64(seed, s)))`` — zero
    explode, zero extra shuffle, pure whole-stage codegen. Hash ``i``
    is seeded by prepending the literal seed as xxhash64's first
    argument. The seed MUST be captured via this enclosing function's
    parameter and the transform lambda MUST take exactly one argument:
    PySpark counts a defaulted second parameter (``lambda s, i=i:``)
    toward the lambda's arity and binds it to the array-POSITION
    column, silently turning all n signatures into one position-seeded
    hash (no LSH guarantee — same hazard lang_argmax documents in
    queries/pipeline.py)."""
    def _mh(seed: int):
        return F.array_min(
            F.transform(F.col("shingles"),
                        lambda s: F.xxhash64(F.lit(seed), s)))

    return shingles.select(
        F.col(id_col), *extra_cols,
        *[_mh(i).alias(f"mh_{i}") for i in range(n_hashes)],
    )


def _signatures_from_shingles(shingles: DataFrame, id_col: str,
                              n_hashes: int) -> DataFrame:
    """MinHash signature from a (id, shingles array) table: hash function
    ``i`` is the ``i%4``-th 8-hex-char (32-bit) chunk of
    md5('<i//4>|' || shingle) — fixed-width hex, so the string MIN is the
    integer MIN. One MD5 yields four independent 32-bit hash functions
    (4x less hashing than one MD5 per function; codegen subexpression
    elimination computes each seed's MD5 once). One aggregate, one
    shuffle."""
    sh = shingles.select(id_col, F.explode("shingles").alias("shingle"))
    aggs = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"{i // 4}|"), F.col("shingle"))),
                (i % 4) * 8 + 1, 8,
            )
        ).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       k: int = 3, n_hashes: int = 8) -> DataFrame:
    """(id, mh_0 .. mh_{n-1}): per-doc MinHash signature."""
    return _signatures_from_shingles(
        doc_shingles(df, text_col, id_col, k), id_col, n_hashes
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      k: int = 3, n_hashes: int = 8, band_rows: int = 2,
                      threshold: float = 0.6,
                      fast_signatures: bool = False) -> DataFrame:
    """MinHash-LSH near-dup candidates verified with exact Jaccard.

    Bands of ``band_rows`` minhashes; docs sharing any band signature are
    candidates (bucket equi-join — never all-pairs). Candidates are then
    verified with the true shingle Jaccard >= threshold, computed by
    intersecting the two docs' shingle ARRAYS (candidates are sparse, so
    two id-joins + array_intersect beats re-exploding and self-joining
    every shingle — at sf0.1 this is ~10x less shuffle).

    ``fast_signatures=True`` is the bench/production-scale knob (r12
    verdict task 2): signatures come from the zero-explode xxhash64
    ``array_min(transform(...))`` path instead of the md5
    explode+aggregate convention. Both are true per-seed minhashes, so
    the LSH s-curve — and therefore the EXACT-verified output's recall
    characteristics — is the same family; only the hash convention
    differs, so individual candidate sets can differ pair-by-pair at
    the s-curve's probabilistic margin. The md5 path stays the default
    because the landed index format (sinks/index_store.py) and the
    DuckDB oracle pin that convention; the fast path skips the
    ~500M-row explode whose multi-GB aggregation cache made the 64x
    bench lose tasks under memory pressure.
    """
    if band_rows <= 0 or n_hashes % band_rows != 0:
        # silent truncation would band only (n_hashes // band_rows) *
        # band_rows of the signatures (paying for all of them), and
        # band_rows > n_hashes would yield ZERO bands — an empty result
        # on a corpus full of duplicates, with no error
        raise ValueError(
            f"minhash_lsh_pairs: band_rows={band_rows} must divide "
            f"n_hashes={n_hashes}")
    # Repartition before the per-doc compute: a single-file corpus would
    # otherwise tokenize/hash on 1-2 tasks regardless of cores. Shingles
    # feed both sides of the verify join AND the signature derivation;
    # the signature table feeds both sides of the band join — cache both
    # narrow intermediates.
    shingles = doc_shingles(df, text_col, id_col, k).cache()
    make_sig = (_fast_signatures_from_shingles if fast_signatures
                else _signatures_from_shingles)
    sig = make_sig(shingles, id_col, n_hashes).cache()
    bands = _band_table(sig, id_col, n_hashes, band_rows)
    return verified_pairs_from_index(shingles, bands, id_col, threshold)


def verified_pairs_from_index(shingles: DataFrame, bands: DataFrame,
                              id_col: str,
                              threshold: float) -> DataFrame:
    """Bucket-join + exact-Jaccard verify over ALREADY-BUILT shingle
    and band tables — the shared tail of minhash_lsh_pairs, callable
    directly on a landed index (sinks/index_store.py) so rebuilding the
    pair graph from bronze never re-shingles the corpus."""
    left = bands.select(F.col(id_col).alias("id_a"), "band", "sig")
    right = bands.select(F.col(id_col).alias("id_b"), "band", "sig")
    cand = (
        left.join(right, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sh_a = shingles.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = shingles.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    # The candidate set is usually sparse, but its size is data-dependent
    # (an adversarial corpus where everything collides into one band
    # bucket makes it quadratic) — so no forced broadcast hint here. AQE
    # sees cand's true size at the shuffle boundary and upgrades the join
    # to broadcast when it is genuinely small, without OOM risk when not.
    paired = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
    return (
        paired.withColumn("jaccard", dround(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _band_table(sig: DataFrame, id_col: str, n_hashes: int,
                band_rows: int, extra_cols: tuple = ()) -> DataFrame:
    """(id, band, sig) LSH bucket keys from a minhash signature table —
    the one banding convention every LSH consumer (batch pairs,
    incremental pairs, the persisted index) shares. ``extra_cols``
    (e.g. a block key) pass through per band row."""
    n_bands = n_hashes // band_rows
    return sig.select(
        F.col(id_col), *extra_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws("", *[
                        F.col(f"mh_{b * band_rows + r}")
                        for r in range(band_rows)
                    ]).alias("sig"),
                )
                for b in range(n_bands)
            ])
        ).alias("bs"),
    ).select(id_col, *extra_cols, F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"))


def minhash_index(df: DataFrame, text_col: str, id_col: str, k: int = 3,
                  n_hashes: int = 8) -> tuple[DataFrame, DataFrame]:
    """The corpus-side dedup INDEX: (shingles, signatures) for a corpus
    that incremental batches will match against. In production this
    lands bronze ONCE — signatures bucketed by id, the band table by
    (band, sig) — so each day's batch joins co-located buckets instead
    of re-shingling 100 TB (the operational mode
    :func:`incremental_minhash_pairs` exists for)."""
    shingles = doc_shingles(df, text_col, id_col, k)
    return shingles, _signatures_from_shingles(shingles, id_col, n_hashes)


def incremental_minhash_pairs(new_df: DataFrame,
                              base_index: tuple[DataFrame, DataFrame],
                              text_col: str, id_col: str, k: int = 3,
                              n_hashes: int = 8, band_rows: int = 2,
                              threshold: float = 0.6,
                              new_index: tuple[DataFrame, DataFrame]
                              | None = None,
                              probe_prefilter_max: int = 0) -> DataFrame:
    """INCREMENTAL MinHash-LSH dedup — the production mode: match a new
    batch against a precomputed corpus index (:func:`minhash_index`)
    plus itself, WITHOUT re-processing the corpus. Per-batch work is
    O(|batch|) shingling/hashing + band-bucket joins; the corpus
    contributes only its (precomputed) band and shingle tables, and no
    base x base pair is ever generated — those were resolved when the
    corpus was built.

    Semantics equal the full recomputation restricted to pairs with at
    least one new doc: a doc's signature depends only on its own
    shingles, so band buckets are identical whether the corpus is
    processed whole or in arriving batches (the oracle exploits exactly
    this — verified hash-green against the full-corpus pair CTE
    filtered to new-involving pairs).

    Returns (id_a, id_b, jaccard, is_cross) with id_a < id_b;
    ``is_cross`` marks new-vs-corpus matches (False = both docs are in
    the new batch).

    ``new_index`` optionally passes the batch's OWN (shingles,
    signatures) tables when the caller has already computed (and
    cached) them — the streaming micro-batch path lands both tables
    anyway, so recomputing the md5 signature aggregate from text here
    would pay the batch's most expensive stage twice (r17). Must be
    exactly ``minhash_index(new_df, ...)`` under the same k/n_hashes;
    results are identical by construction.

    ``probe_prefilter_max`` > 0 (r18, the streaming probe's opt-in —
    the registry query path keeps its collect-free plan at the
    default 0) bounds-collects the candidate pair set once it is
    known: when the band join yields at most that many candidates,
    the verify stage re-roots on the collected (tiny) candidate
    table and pushes the cross-candidate ids into the BASE shingle
    scan as an In filter — against an id-range-clustered artifact
    (index_store layout 2) parquet min-max stats then prune the
    heavy shingle-array row groups to Theta(candidates) instead of
    decoding Theta(corpus). Larger candidate sets fall back to the
    unfiltered plan. Result-identical either way: the collected set
    IS the full candidate set, and dropping base rows whose id is in
    no candidate removes only rows the verify join could never
    match."""
    if band_rows <= 0 or n_hashes % band_rows != 0:
        raise ValueError(
            f"incremental_minhash_pairs: band_rows={band_rows} must "
            f"divide n_hashes={n_hashes}")
    base_sh, base_sig = base_index
    if new_index is not None:
        new_sh, new_sig = new_index
        new_bands = _band_table(new_sig, id_col, n_hashes, band_rows)
    else:
        new_sh = doc_shingles(new_df, text_col, id_col, k).cache()
        new_sig = _signatures_from_shingles(new_sh, id_col, n_hashes)
        new_bands = _band_table(new_sig, id_col, n_hashes,
                                band_rows).cache()
    base_bands = _band_table(base_sig, id_col, n_hashes, band_rows)
    probe = new_bands.select(F.col(id_col).alias("id_n"), "band", "sig")
    build = (
        base_bands.select(F.col(id_col).alias("id_e"), "band", "sig")
        .withColumn("is_cross", F.lit(True))
        .unionByName(
            new_bands.select(F.col(id_col).alias("id_e"), "band", "sig")
            .withColumn("is_cross", F.lit(False)))
    )
    cand = (
        probe.join(build, ["band", "sig"])
        # within-batch pairs orient once (id_n < id_e); cross pairs keep
        # every (new, existing) hit. The explicit id_n != id_e guard
        # covers RE-INGESTED ids (same doc id on both sides — a replayed
        # or corrected batch): without it the cross arm passes the
        # degenerate self-pair through (r8 advice); disjoint corpora are
        # unaffected since non-cross pairs already require strict <.
        .filter((F.col("id_n") != F.col("id_e"))
                & (F.col("is_cross") | (F.col("id_n") < F.col("id_e"))))
        .select("id_n", "id_e", "is_cross")
        .distinct()
    )
    if probe_prefilter_max > 0:
        rows = cand.limit(probe_prefilter_max + 1).collect()
        if len(rows) <= probe_prefilter_max:
            spark = new_df.sparkSession
            cand = spark.createDataFrame(rows, cand.schema)
            cross_ids = sorted({r["id_e"] for r in rows
                                if r["is_cross"]})
            base_sh = (base_sh.filter(F.col(id_col).isin(cross_ids))
                       if cross_ids
                       else base_sh.filter(F.lit(False)))
    sh_n = new_sh.select(F.col(id_col).alias("id_n"),
                         F.col("shingles").alias("sh_a"))
    sh_e = (base_sh.select(F.col(id_col).alias("id_e"),
                           F.col("shingles").alias("sh_b"))
            .unionByName(new_sh.select(F.col(id_col).alias("id_e"),
                                       F.col("shingles").alias("sh_b"))))
    paired = cand.join(sh_n, "id_n").join(sh_e, "id_e")
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
    return (
        paired.withColumn("jaccard", dround(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select(F.least("id_n", "id_e").alias("id_a"),
                F.greatest("id_n", "id_e").alias("id_b"),
                "jaccard", "is_cross")
        # a new x new pair can ALSO collide as probe-vs-build duplicates
        # after least/greatest normalization, and a pair of two
        # RE-INGESTED ids passes both the cross arm and the
        # within-batch arm with CONFLICTING flags — so collapse on the
        # pair key, not distinct() over is_cross (r9 advice). max():
        # True wins, "this pair also matched the standing corpus index"
        # — the flag consumers act on (cross pairs mean the new doc
        # duplicates already-accepted corpus and is dropped; pure
        # within-batch pairs resolve among themselves).
        .groupBy("id_a", "id_b", "jaccard")
        .agg(F.max("is_cross").alias("is_cross"))
    )


def _hex_digit(col: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), col) - 1


def simhash_bits(df: DataFrame, text_col: str, id_col: str,
                 n_bits: int = 32, k: int = 3) -> DataFrame:
    """(id, simhash) where simhash is an ``n_bits``-char '0'/'1' string.

    SimHash over the doc's distinct k-word SHINGLES (shingle sets are
    discriminative even on small vocabularies, where token-set simhash
    degenerates into all-pairs collisions). Bit b of a shingle's MD5
    comes from hex digit b//4, bit 3-(b%4); the simhash bit is the sign
    of the +/-1 sum across shingles.

    Plan shape: one explode (doc x shingle), one projection with n_bits
    +/-1 columns, one groupBy with n_bits SUMs — no per-bit row explosion
    (n_bits x fewer intermediate rows than the naive unnest form). All
    arithmetic mirrors 1:1 into the DuckDB oracle.
    """
    sh = shingle_table(df, text_col, id_col, k).select(
        F.col(id_col), F.md5(F.col("shingle")).alias("h")
    )
    weights = []
    for b in range(n_bits):
        digit = _hex_digit(F.substring(F.col("h"), b // 4 + 1, 1))
        bit = F.floor(digit / F.lit(2 ** (3 - b % 4))).cast("long") % 2
        weights.append((bit * 2 - 1).alias(f"w_{b}"))
    per_doc = sh.select(F.col(id_col), *weights).groupBy(id_col).agg(
        *[F.sum(f"w_{b}").alias(f"s_{b}") for b in range(n_bits)]
    )
    bitchars = [
        F.when(F.col(f"s_{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(n_bits)
    ]
    return per_doc.select(F.col(id_col), F.concat(*bitchars).alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  n_bits: int = 32, max_hamming: int = 3,
                  k: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: banded on ``max_hamming + 1`` chunks
    (pigeonhole: hamming <= H implies at least one of H+1 chunks is
    identical — the band count DERIVES from max_hamming, so recall is
    guaranteed for ANY threshold, not just the default 3), verified by
    exact hamming distance. Chunk boundaries spread the remainder so
    every bit belongs to exactly one chunk."""
    n_chunks = max_hamming + 1
    if n_chunks > n_bits:
        raise ValueError(
            f"simhash_pairs: max_hamming={max_hamming} needs "
            f"{n_chunks} bands but the signature has only {n_bits} bits")
    sig = simhash_bits(df, text_col, id_col, n_bits, k).cache()
    # chunk i covers [bounds[i], bounds[i+1]) — sizes differ by at most
    # one bit when n_chunks doesn't divide n_bits
    bounds = [round(i * n_bits / n_chunks) for i in range(n_chunks + 1)]
    bands = sig.select(
        F.col(id_col), F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("simhash", bounds[i] + 1,
                                bounds[i + 1] - bounds[i]).alias("sig"),
                )
                for i in range(n_chunks)
            ])
        ).alias("bs"),
    ).select(id_col, "simhash", F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"))
    a = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                     "band", "sig")
    b = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                     "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.aggregate(
        F.sequence(F.lit(1), F.lit(n_bits)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.substring(F.col("sh_a"), 1, n_bits).substr(i, F.lit(1))
            != F.substring(F.col("sh_b"), 1, n_bits).substr(i, F.lit(1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embed_near_dup(df: DataFrame, vec_col: str, id_col: str,
                   threshold: float, n_planes: int = 24, n_bands: int = 8,
                   dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, cosine ≥
    threshold) — the semantic-dedup tier of the dedup family.

    Candidates come from the same random-hyperplane banded LSH as the
    similarity tier (never all-pairs: a pair is considered only if it
    shares a band bucket; expected bucket size |corpus|/2^bits), then the
    exact cosine verifies. Scale path = widen bands with corpus size.
    """
    from .similarity import hyperplane_signs, lsh_signatures
    from ..functions.vectors import as_double, dot, norm

    planes = hyperplane_signs(n_planes, dim)
    chunk = n_planes // n_bands
    sigs = lsh_signatures(df, vec_col, id_col, planes)
    bands = sigs.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.substring("lsh_sig", i * chunk + 1, chunk).alias("sig"))
            for i in range(n_bands)
        ])).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"))
    a = bands.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    v = v.withColumn("n", norm(F.col("v")))
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                  F.col("n").alias("na"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                  F.col("n").alias("nb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cos_sim", dround(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semantic_dedup(df: DataFrame, vec_col: str, id_col: str,
                   centroids: DataFrame, threshold: float = 0.45
                   ) -> DataFrame:
    """SemDeDup-style semantic deduplication (public method: k-means
    cluster the embedding space, compare pairs only WITHIN a cluster,
    drop all but one of each semantic near-dup set).

    Complements :func:`embed_near_dup`: same exact-cosine verify, but
    candidates are bucketed by LEARNED cluster (the trained-IVF cells)
    instead of random hyperplanes — the published trade: clusters track
    the corpus's actual density, so near-dups co-bucket with fewer
    misses, at the cost of training; hyperplanes are training-free.
    Per-pair work is bounded by cluster sizes (|corpus|²/n_cells in
    expectation, the SemDeDup bound) — never all-pairs. Survivor rule:
    deterministic keep-min-id (a row drops iff a same-cluster neighbor
    with a SMALLER id scores >= threshold).

    Returns (id, cell_id, keep) for EVERY input row — the keep=false
    rows are the semantic duplicates a curation pipeline removes.
    """
    from ..functions.vectors import as_double, dot, norm
    from .similarity import ivf_assign

    v = df.select(F.col(id_col),
                  as_double(F.col(vec_col)).alias("cv"))
    assigned = ivf_assign(v, centroids, "cv", "centv")
    a = assigned.select(F.col(id_col).alias("id_a"), "cell_id",
                        F.col("cv").alias("va"))
    b = assigned.select(F.col(id_col).alias("id_b"), "cell_id",
                        F.col("cv").alias("vb"))
    dropped = (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", dround(
            dot(F.col("va"), F.col("vb"))
            / (norm(F.col("va")) * norm(F.col("vb"))), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)),
                      id_col, "left")
        .select(id_col, "cell_id",
                F.col("_drop").isNull().alias("keep"))
    )


def chunk_boilerplate_dedup(df: DataFrame, text_col: str, id_col: str,
                            chunk_tokens: int = 10,
                            max_doc_freq: int = 2) -> DataFrame:
    """Paragraph/boilerplate removal (CCNet-style, fixed token windows):
    drop every ``chunk_tokens``-token chunk that appears in >=
    ``max_doc_freq`` distinct documents, reassemble the rest in order.

    Relational end-to-end: positional explode -> chunk aggregate ->
    corpus-wide frequency -> anti-filter -> ordered re-aggregate. Two
    groupBys + one join, all partial-agg friendly; nothing is ever
    all-pairs. The corpus-wide frequency join keys on md5(chunk_text),
    not the raw text — the frequency shuffle then moves 32-byte keys
    instead of arbitrarily long chunk strings, which is what survives at
    petabyte scale.

    Output: (id, clean_sha = md5 of the reassembled text or NULL when
    every chunk was boilerplate, n_chunks_kept, n_chunks_dropped).
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    ).withColumn("chunk_id", F.floor(F.col("pos") / chunk_tokens))
    chunks = toks.groupBy(id_col, "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"]),
            " ").alias("chunk_text")
    )
    chunks = chunks.withColumn("chunk_key", F.md5("chunk_text"))
    freq = chunks.groupBy("chunk_key").agg(
        F.count_distinct(F.col(id_col)).alias("n_docs"))
    kept = chunks.join(freq, "chunk_key").filter(
        F.col("n_docs") < max_doc_freq)
    out = kept.groupBy(id_col).agg(
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                lambda s: s["chunk_text"]),
            " ")).alias("clean_sha"),
        F.count("*").alias("n_chunks_kept"),
    )
    totals = chunks.groupBy(id_col).agg(F.count("*").alias("_n_chunks"))
    return (
        totals.join(out, id_col, "left")
        .select(
            id_col,
            "clean_sha",
            F.coalesce("n_chunks_kept", F.lit(0)).alias("n_chunks_kept"),
            (F.col("_n_chunks")
             - F.coalesce("n_chunks_kept", F.lit(0))).alias("n_chunks_dropped"),
        )
    )
