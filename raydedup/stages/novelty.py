"""Corpus n-gram novelty: per document, the fraction of its distinct
k-gram shingles whose FIRST corpus occurrence (min doc_id) is this
document — the diversity/staleness diagnostic a webtext curation run
reads before deciding how aggressively to dedup a source (a doc whose
shingles all appeared earlier is boilerplate even when no single pair
clears the near-dup threshold).

Reference parity: composes the same shingle kernel as the Jaccard
surface (functions/text.shingle_batch — SURVEY.md §2.3's text→set map,
cf. reference jaccardKernels §ec_scan building per-row sets); the
novelty reduction itself is a corpus-wide min-exchange, the same
combiner-exchange shape as stages/vocab.py's DF table.

Scale shape (tokenize ONCE, two bounded exchanges):
  exchange 1, keyed hash(shingle): the map side emits one
    (shingle, partial_min_doc) row per distinct shingle per map chunk
    (per-chunk pre-min — never the raw shingle stream) PLUS one
    (doc, set_size) row per doc already keyed hash(doc); each shingle
    partition computes its global min per shingle (exact: a shingle
    lives in exactly one partition) and collapses to one
    (first_doc, novel_count) row per distinct first_doc.
  exchange 2, keyed hash(doc): doc-cardinality rows only — novel-count
    partials meet each doc's single size row; novelty = n_novel /
    max(n_shingles, 1) (an IEEE division of exact integers, mirrored
    by the SQL oracle).

Hash-equality convention: shingles are grouped by their 64-bit hash,
the SQL oracle by the shingle STRING — a cross-doc hash collision
would merge two first-occurrence groups (same documented convention as
containment's denominator and the 128-bit content hashes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shuffle import hash_partition_map

# row kinds flowing through the two exchanges (one union schema so a
# single hash_partition_map call carries both sides)
_K_SHINGLE = 0   # k = shingle hash (int64 view), v = partial min doc
_K_SIZE = 1      # k = doc_id, v = n_shingles
_K_NOVEL = 2     # k = doc_id, v = partial novel count

_EMPTY = pa.table({
    "k": pa.array([], pa.int64()),
    "v": pa.array([], pa.int64()),
    "kind": pa.array([], pa.int8()),
    "part": pa.array([], pa.int64()),
})


def ngram_novelty(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset(doc_id, n_shingles, n_novel, novelty): per doc, its
    distinct k-shingle count, how many of those shingles first appear
    (by min doc_id) in this doc, and the ratio.  Docs with no shingles
    (< k tokens) report (0, 0, 0.0)."""
    from ..functions.text import shingle_batch

    n_parts = cfg.resolved_partitions()
    k_sh = cfg.k_shingle

    def _hashp(x: np.ndarray) -> np.ndarray:
        return (np.asarray(splitmix64(x.view(np.uint64).copy()))
                % np.uint64(n_parts)).astype(np.int64)

    def _emit(t: pa.Table) -> pa.Table:
        ids = np.ascontiguousarray(np.asarray(t[id_col], dtype=np.int64))
        vals, offs = shingle_batch(t[text_col].combine_chunks(), k_sh)
        n_sh = (offs[1:] - offs[:-1]).astype(np.int64)
        # per-chunk pre-min: each (shingle, owning doc) with the doc ids
        # repeated at offsets, grouped to the chunk-local min owner
        sh = vals.view(np.int64)
        owner = np.repeat(ids, n_sh)
        if len(sh):
            order = np.lexsort((owner, sh))
            sh_s, ow_s = sh[order], owner[order]
            first = np.empty(len(sh_s), dtype=bool)
            first[0] = True
            first[1:] = sh_s[1:] != sh_s[:-1]
            sh_u, ow_min = sh_s[first], ow_s[first]
        else:
            sh_u = np.empty(0, np.int64)
            ow_min = np.empty(0, np.int64)
        return pa.table({
            "k": pa.array(np.concatenate([sh_u, ids]), pa.int64()),
            "v": pa.array(np.concatenate([ow_min, n_sh]), pa.int64()),
            "kind": pa.array(np.concatenate(
                [np.full(len(sh_u), _K_SHINGLE, np.int8),
                 np.full(len(ids), _K_SIZE, np.int8)]), pa.int8()),
            "part": pa.array(np.concatenate(
                [_hashp(sh_u), _hashp(ids)]), pa.int64()),
        })

    def _reduce_shingles(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return _EMPTY
        kind = np.asarray(tab["kind"].combine_chunks(), dtype=np.int8)
        k = np.asarray(tab["k"].combine_chunks(), dtype=np.int64)
        v = np.asarray(tab["v"].combine_chunks(), dtype=np.int64)
        shm = kind == _K_SHINGLE
        sh, mn = k[shm], v[shm]
        if len(sh):
            order = np.lexsort((mn, sh))
            sh_s, mn_s = sh[order], mn[order]
            first = np.empty(len(sh_s), dtype=bool)
            first[0] = True
            first[1:] = sh_s[1:] != sh_s[:-1]
            fd = mn_s[first]                      # global first doc/shingle
            fd_u, nn = np.unique(fd, return_counts=True)
        else:
            fd_u = np.empty(0, np.int64)
            nn = np.empty(0, np.int64)
        # pass the co-routed size rows through to exchange 2 untouched
        return pa.table({
            "k": pa.array(np.concatenate([fd_u, k[~shm]]), pa.int64()),
            "v": pa.array(np.concatenate(
                [nn.astype(np.int64), v[~shm]]), pa.int64()),
            "kind": pa.array(np.concatenate(
                [np.full(len(fd_u), _K_NOVEL, np.int8),
                 kind[~shm]]), pa.int8()),
            "part": pa.array(np.concatenate(
                [_hashp(fd_u), _hashp(k[~shm])]), pa.int64()),
        })

    out_empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "n_shingles": pa.array([], pa.int64()),
        "n_novel": pa.array([], pa.int64()),
        "novelty": pa.array([], pa.float64()),
    })

    def _reduce_docs(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return out_empty
        kind = np.asarray(tab["kind"].combine_chunks(), dtype=np.int8)
        k = np.asarray(tab["k"].combine_chunks(), dtype=np.int64)
        v = np.asarray(tab["v"].combine_chunks(), dtype=np.int64)
        sm = kind == _K_SIZE
        doc, ns = k[sm], v[sm]                    # exactly one row per doc
        order = np.argsort(doc, kind="stable")
        doc, ns = doc[order], ns[order]
        nn = np.zeros(len(doc), dtype=np.int64)
        nd, nv = k[~sm], v[~sm]
        if len(nd):
            pos = np.searchsorted(doc, nd)
            np.add.at(nn, pos, nv)
        return pa.table({
            id_col: pa.array(doc, pa.int64()),
            "n_shingles": pa.array(ns, pa.int64()),
            "n_novel": pa.array(nn, pa.int64()),
            "novelty": pa.array(
                nn.astype(np.float64) / np.maximum(ns, 1), pa.float64()),
        })

    stage1 = hash_partition_map(
        docs_ds, "part", _reduce_shingles, n_parts,
        map_fn=_emit, map_chunk_rows=cfg.batch_size)
    return hash_partition_map(stage1, "part", _reduce_docs, n_parts)
