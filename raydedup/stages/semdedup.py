"""SemDeDup-style semantic dedup over an embedding column.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes *semantic*
duplicates — documents whose embeddings are nearly parallel even though
their text differs (translations, templated rewrites, boilerplate
paraphrases) — by k-means-clustering the embedding space and comparing
pairs only WITHIN each cluster: O(Σ m_c²) instead of O(N²), with the
quantizer deciding which comparisons are worth making.

Reference analogue: the same candidate-pruning idea as the reference's
CSR neighborhood intersection (jaccard.cpp only intersects adjacent
rows, never all pairs); here the "adjacency" is learned from geometry.

Physical plan (house patterns):

1. Quantizer: spherical k-means (``ann._kmeans``) trained on a
   deterministic hash-sample collected once — the driver holds the
   sample, never the corpus (same discipline as ``ann_ivf_topk``).
2. Assignment: centroids broadcast via ``ray.put``; one matmul +
   argmax per batch appends a ``cluster`` column.
3. ONE manual hash exchange of the full rows keyed by cluster; each
   reduce partition walks its clusters in segment order and runs a
   TILED self-matmul per cluster (memory bounded by tile², compute
   stays O(m_c²) — exactly what SemDeDup prescribes), emitting either
   the ≥-threshold pairs or the per-component survivors (min id per
   component via the shared numpy CC kernel).

k-means is not SQL-expressible, so the driver queries are rows-only;
tests/test_semdedup.py gates precision (=1.0 by re-scoring every
emitted pair) and recall vs global brute force on planted duplicates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shuffle import hash_partition_map
from .ann import _embedding_matrix, _kmeans, _normalize
from .cc import label_components_arrays

# Per-cluster matmul tile edge: one tile is ≤ TILE² float64 sims
# (8192² ≈ 512 MB would be too big; 2048² = 32 MB keeps several tiles
# in flight per worker without pressuring the heap).
SEMDEDUP_TILE = 2048


def assign_clusters(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                    n_clusters: int | None = None, train_sample: int = 20000,
                    id_col: str = "vec_id", emb_col: str = "embedding"):
    """Append a ``cluster`` int64 column (nearest spherical-k-means
    centroid).  → (assigned_ds, centroids ndarray).  The quantizer
    trains on a deterministic hash-sample of ~``train_sample`` rows."""
    import ray

    n = ds.count()
    if n_clusters is None:
        n_clusters = max(2, int(np.sqrt(max(n, 4))))
    frac = min(1.0, train_sample / max(n, 1))
    cut = np.uint64(min(int(frac * (2**64 - 1)), 2**64 - 1))
    salt = np.uint64((cfg.seed * 0x9E3779B97F4A7C15) & (2**64 - 1))

    def _pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        return t.filter(pa.array(splitmix64(ids.view(np.uint64) ^ salt)
                                 <= cut))

    picked = [t for t in ray.get(
        ds.map_batches(_pick, batch_format="pyarrow").to_arrow_refs())
        if len(t)]
    sample = pa.concat_tables(picked)
    mat = _normalize(_embedding_matrix(sample, emb_col))
    k = min(n_clusters, len(mat))
    cents = _kmeans(mat, k, iters=10, seed=cfg.seed)
    cents_ref = ray.put(cents)

    def _assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        if len(t) == 0:
            return t.append_column("cluster", pa.array([], pa.int64()))
        m = _normalize(_embedding_matrix(t, emb_col))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(assign, pa.int64()))

    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True), cents


def _cluster_segments(t: pa.Table, id_col: str, emb_col: str):
    """Sort a partition by cluster → per-cluster (ids, matrix) segments."""
    cl = np.asarray(t["cluster"], dtype=np.int64)
    order = np.argsort(cl, kind="stable")
    tt = t.take(pa.array(order, pa.int64()))
    cl_s = cl[order]
    ids = np.asarray(tt[id_col], dtype=np.int64)
    mat = _normalize(_embedding_matrix(tt, emb_col))
    starts = np.flatnonzero(np.concatenate([[True], cl_s[1:] != cl_s[:-1]]))
    bounds = np.concatenate([starts, [len(cl_s)]])
    return tt, ids, mat, bounds


def _pairs_in_cluster(ids: np.ndarray, mat: np.ndarray, threshold: float):
    """Upper-triangle tiled self-matmul → (a, b, cosine) with a < b by
    POSITION (ids need not be sorted; a/b are remapped to min/max)."""
    m = len(ids)
    outs_a, outs_b, outs_c = [], [], []
    for i0 in range(0, m, SEMDEDUP_TILE):
        mi = mat[i0:i0 + SEMDEDUP_TILE]
        for j0 in range(i0, m, SEMDEDUP_TILE):
            sims = mi @ mat[j0:j0 + SEMDEDUP_TILE].T
            hi, hj = np.nonzero(sims >= threshold)
            gi, gj = hi + i0, hj + j0
            keep = gi < gj
            if not keep.any():
                continue
            gi, gj = gi[keep], gj[keep]
            a, b = ids[gi], ids[gj]
            lo, hi_ = np.minimum(a, b), np.maximum(a, b)
            outs_a.append(lo)
            outs_b.append(hi_)
            outs_c.append(sims[hi[keep], hj[keep]])
    if not outs_a:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.float64)
    return (np.concatenate(outs_a), np.concatenate(outs_b),
            np.concatenate(outs_c))


def semantic_dup_pairs(ds, threshold: float = 0.95,
                       cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       n_clusters: int | None = None,
                       train_sample: int = 20000,
                       id_col: str = "vec_id", emb_col: str = "embedding"):
    """→ Dataset(a, b, cosine_e6): within-cluster pairs with cosine ≥
    threshold (approximate global pairs: cross-cluster duplicates are
    unseen — recall gated in tests)."""
    assigned, _ = assign_clusters(ds, cfg, n_clusters=n_clusters,
                                  train_sample=train_sample,
                                  id_col=id_col, emb_col=emb_col)
    n_parts = cfg.num_partitions

    def _part(t: pa.Table) -> pa.Table:
        cl = np.asarray(t["cluster"], dtype=np.int64)
        return t.append_column(
            "_part", pa.array((cl % n_parts).astype(np.int64), pa.int64()))

    def _emit_pairs(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "cosine_e6": z})
        _, ids, mat, bounds = _cluster_segments(t, id_col, emb_col)
        a_all, b_all, c_all = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            a, b, cos = _pairs_in_cluster(ids[s:e], mat[s:e], threshold)
            if len(a):
                a_all.append(a)
                b_all.append(b)
                c_all.append(cos)
        if not a_all:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "cosine_e6": z})
        cos = np.concatenate(c_all)
        return pa.table({
            "a": pa.array(np.concatenate(a_all), pa.int64()),
            "b": pa.array(np.concatenate(b_all), pa.int64()),
            "cosine_e6": pa.array(np.round(cos * 1e6).astype(np.int64),
                                  pa.int64()),
        })

    return hash_partition_map(assigned, "_part", _emit_pairs, n_parts,
                              map_fn=_part, map_chunk_rows=cfg.batch_size)


def semantic_dedup(ds, threshold: float = 0.95,
                   cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   n_clusters: int | None = None, train_sample: int = 20000,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Corpus-out semantic dedup: keep exactly one row (min id) per
    within-cluster ≥-threshold component; all other rows pass through
    unchanged.  The survivors are decided INSIDE the cluster exchange —
    the corpus moves once and no drop set ever reaches the driver."""
    assigned, _ = assign_clusters(ds, cfg, n_clusters=n_clusters,
                                  train_sample=train_sample,
                                  id_col=id_col, emb_col=emb_col)
    n_parts = cfg.num_partitions

    def _part(t: pa.Table) -> pa.Table:
        cl = np.asarray(t["cluster"], dtype=np.int64)
        return t.append_column(
            "_part", pa.array((cl % n_parts).astype(np.int64), pa.int64()))

    def _keep(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            return pa.table({})
        tt, ids, mat, bounds = _cluster_segments(t, id_col, emb_col)
        drop_mask = np.zeros(len(ids), dtype=bool)
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            a, b, _cos = _pairs_in_cluster(ids[s:e], mat[s:e], threshold)
            if not len(a):
                continue
            nodes, comp = label_components_arrays(a, b)
            drops = nodes[nodes != comp]          # everyone but min id
            seg_ids = ids[s:e]
            drop_mask[s:e] = np.isin(seg_ids, drops)
        return tt.drop_columns(["cluster"]).filter(pa.array(~drop_mask))

    return hash_partition_map(assigned, "_part", _keep, n_parts,
                              map_fn=_part, map_chunk_rows=cfg.batch_size)
