"""Artifact retention over the three digest-keyed index stores (r16,
r15 verdict task 6).

Every fold writes a NEW digest-keyed directory — correct, because the
base artifact is still being read while the fold writes (ann_store /
postings_store / index_store all enforce it) — but nothing ever
deleted superseded copies, so a long-running lake accumulates one full
index per fold. This module is the missing lifecycle tail:

- :func:`list_artifacts` — walk a root for complete artifacts (a dir
  is an artifact iff it holds a readable ``_META.json``; a crashed or
  half-deleted build reads as absent, same rule as every store).
- :func:`prune` — keep the newest ``keep`` per kind (minhash / bm25 /
  ivf), delete the rest. DRY-RUN by default; the newest artifact of
  each kind is NEVER deleted (even ``--keep 0`` refuses — the
  digest-current copy is what live readers gate against), and any
  digest listed in ``active_digests`` is refused too (the operator's
  pin for an index still referenced by a running consumer).

Deletion removes the meta FIRST, then the data: a reader that races a
prune sees a meta-less directory — "absent", the safe answer — never
a meta pointing at half-deleted parquet.
"""

from __future__ import annotations

import os
import shutil

from .index_store import META_NAME

KINDS = ("minhash", "bm25", "ivf")


def _infer_kind(meta: dict) -> str | None:
    """Pre-r16 minhash metas carry no ``kind`` — infer from the build
    parameters that only that store writes."""
    k = meta.get("kind")
    if k in KINDS:
        return k
    if {"n_hashes", "band_rows", "threshold"} <= meta.keys():
        return "minhash"
    return None


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def list_artifacts(root: str) -> list[dict]:
    """Complete artifacts directly under ``root`` (plus ``root``
    itself if it is one), newest meta first. Each entry: path, kind,
    digest, n (docs/vecs if recorded), mtime of the meta (commit time
    — the meta is written LAST by every builder), and on-disk bytes."""
    # the ONE completeness rule every store defines ("no readable
    # meta == absent") — reuse it, never restate it
    from .index_store import read_index_meta

    if not os.path.isdir(root):
        return []  # nothing landed yet — an empty lake, not an error
    cands = [root] + sorted(
        os.path.join(root, d) for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)))
    out = []
    for path in cands:
        mp = os.path.join(path, META_NAME)
        meta = read_index_meta(path)
        if meta is None:
            continue
        kind = _infer_kind(meta)
        if kind is None or "digest" not in meta:
            continue
        out.append({
            "path": os.path.abspath(path), "kind": kind,
            "digest": meta["digest"],
            "n": meta.get("n_docs", meta.get("n_vecs")),
            "mtime": os.path.getmtime(mp),
            "bytes": _dir_bytes(path),
        })
    out.sort(key=lambda e: e["mtime"], reverse=True)
    return out


def prune(root: str, keep: int = 1,
          active_digests: set[str] | frozenset[str] = frozenset(),
          apply: bool = False) -> dict:
    """Retention pass: per kind, keep the ``keep`` newest artifacts
    (ALWAYS at least the newest — the digest-current copy live
    readers gate against) and delete the rest, except any whose
    digest is in ``active_digests`` (refused, reported). Dry-run
    unless ``apply``. Returns {kept, refused, deleted}, each a list
    of entries as from :func:`list_artifacts`."""
    keep = max(0, keep)
    arts = list_artifacts(root)
    kept: list[dict] = []
    refused: list[dict] = []
    deleted: list[dict] = []
    by_kind: dict[str, list[dict]] = {}
    for e in arts:
        by_kind.setdefault(e["kind"], []).append(e)
    root_abs = os.path.abspath(root)
    for kind_arts in by_kind.values():  # newest-first within kind
        for i, e in enumerate(kind_arts):
            if i < max(keep, 1):  # newest always survives
                kept.append(e)
            elif e["digest"] in active_digests:
                refused.append(e)
            elif e["path"] == root_abs:
                # the root dir CONTAINS the other artifacts — rmtree
                # here would take the survivors with it; refuse and
                # let the operator relocate it
                refused.append(e)
            else:
                deleted.append(e)
    if apply:
        for e in deleted:
            delete_artifact(e["path"])
    return {"kept": kept, "refused": refused, "deleted": deleted}


def delete_artifact(path: str) -> None:
    """Remove one artifact dir with the store-wide race discipline:
    meta FIRST, so a reader that races the deletion sees a meta-less
    directory — "absent", the safe answer — never a meta pointing at
    half-deleted parquet. Used by :func:`prune` and by `annindex
    --rebuild-if-drifted` (the superseded base after a rebuild)."""
    try:
        os.remove(os.path.join(path, META_NAME))
    except OSError:
        pass
    shutil.rmtree(path, ignore_errors=True)
