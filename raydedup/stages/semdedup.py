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

from ..functions.numeric import round_half_away
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
    trains on a deterministic hash-sample of ~``train_sample`` rows;
    the sample is scaled to ≥10·k so the quantizer stays trained when
    ``n_clusters`` defaults to √N at corpus scale (a fixed 20k sample
    with k > 20k centroids would degenerate to one-point cells)."""
    import ray

    n = ds.count()
    if n_clusters is None:
        n_clusters = max(2, int(np.sqrt(max(n, 4))))
    train_sample = max(train_sample, 10 * n_clusters)
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
    # Ray Data does not preserve block order (preserve_order defaults to
    # False), so the arrival order of sample blocks is scheduler-dependent;
    # seeded k-means init indexes ROWS, so sort by id to keep the trained
    # quantizer — and therefore cluster assignment — run-invariant.
    sample = pa.concat_tables(picked).sort_by(id_col)
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
    return tt, ids, mat, bounds, cl_s


def _capped_segments(ids: np.ndarray, cl_s: np.ndarray, bounds: np.ndarray,
                     cap: int | None):
    """Cluster bounds → index segments, salt-splitting over-cap clusters.

    Mirrors the LSH over-cap bucket defence (lsh.py `_emit_run_pairs`):
    a cluster with m > cap members is NOT self-matmulled whole (O(m²)
    sims in one reduce task — a boilerplate mega-cell at corpus scale is
    10¹⁴ evaluations); instead its members are ordered by a
    deterministic per-cluster hash of their ids and chunked into
    overlapping cap-sized sub-cells (consecutive chunks share one
    member), each self-matmulled independently: O(m·cap), linear in m,
    with dense-cluster connectivity preserved through the overlap chain.
    Deterministic for a given cluster membership regardless of
    partitioning or arrival order.

    → (list of int index arrays, stats dict).  ``cap=None`` disables
    capping entirely (every cluster self-matmuls whole — only for
    surfaces whose oracle has no cap, e.g. `semantic_pairs_scored`).
    """
    if cap is not None and cap < 2:
        raise ValueError(f"cluster_cap must be >= 2 (or None for "
                         f"uncapped), got {cap}")
    segs: list[np.ndarray] = []
    stats = {"semdedup_capped_clusters": 0, "semdedup_capped_rows": 0}
    for s, e in zip(bounds[:-1], bounds[1:]):
        m = int(e - s)
        if m < 2:
            continue
        if cap is None or m <= cap:
            segs.append(np.arange(s, e))
            continue
        stats["semdedup_capped_clusters"] += 1
        stats["semdedup_capped_rows"] += m
        idx = np.arange(s, e)
        salt = splitmix64(
            np.asarray([cl_s[s]], dtype=np.int64).view(np.uint64))[0]
        order = np.argsort(splitmix64(ids[idx].view(np.uint64) ^ salt),
                           kind="stable")
        idx = idx[order]
        step = cap - 1                       # 1-member overlap chain
        n_chunks = max(1, -(-(m - 1) // step))
        for c in range(n_chunks):
            segs.append(idx[c * step: c * step + cap])
    return segs, stats


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


def _part_by_cluster(n_parts: int):
    from ..functions.shuffle import part_of

    def _part(t: pa.Table) -> pa.Table:
        cl = np.asarray(t["cluster"], dtype=np.int64)
        return t.append_column(
            "_part", pa.array(part_of(cl, n_parts), pa.int64()))
    return _part


def _pairs_over_clusters(assigned, threshold: float, cfg: PipelineConfig, *,
                         cluster_cap: int | None, counters,
                         id_col: str, emb_col: str):
    """Shared reduce plan: ONE exchange keyed by cluster, then per-cluster
    capped tiled self-matmul → Dataset(a, b, cosine_e6).  Over-cap
    clusters are salt-split (see `_capped_segments`); overlapping chunks
    can re-emit a pair, so each partition dedups its (a, b) locally
    before returning (clusters never span partitions, so local dedup is
    global dedup)."""
    n_parts = cfg.num_partitions

    def _emit_pairs(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "cosine_e6": z})
        _, ids, mat, bounds, cl_s = _cluster_segments(t, id_col, emb_col)
        segs, stats = _capped_segments(ids, cl_s, bounds, cluster_cap)
        if counters is not None and any(stats.values()):
            counters.add.remote(stats)      # settle on read, not here
        a_all, b_all, c_all = [], [], []
        for idx in segs:
            a, b, cos = _pairs_in_cluster(ids[idx], mat[idx], threshold)
            if len(a):
                a_all.append(a)
                b_all.append(b)
                c_all.append(cos)
        if not a_all:
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z, "cosine_e6": z})
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        cos = np.concatenate(c_all)
        pk, first = np.unique(np.stack([a, b], axis=1), axis=0,
                              return_index=True)
        return pa.table({
            "a": pa.array(pk[:, 0].copy(), pa.int64()),
            "b": pa.array(pk[:, 1].copy(), pa.int64()),
            "cosine_e6": pa.array(
                round_half_away(cos[first] * 1e6).astype(np.int64), pa.int64()),
        })

    return hash_partition_map(assigned, "_part", _emit_pairs, n_parts,
                              map_fn=_part_by_cluster(n_parts),
                              map_chunk_rows=cfg.batch_size)


def semantic_dup_pairs(ds, threshold: float = 0.95,
                       cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       n_clusters: int | None = None,
                       train_sample: int = 20000, cluster_cap: int = 4096,
                       counters=None,
                       id_col: str = "vec_id", emb_col: str = "embedding"):
    """→ Dataset(a, b, cosine_e6): within-cluster pairs with cosine ≥
    threshold (approximate global pairs: cross-cluster duplicates are
    unseen — recall gated in tests)."""
    assigned, _ = assign_clusters(ds, cfg, n_clusters=n_clusters,
                                  train_sample=train_sample,
                                  id_col=id_col, emb_col=emb_col)
    return _pairs_over_clusters(assigned, threshold, cfg,
                                cluster_cap=cluster_cap, counters=counters,
                                id_col=id_col, emb_col=emb_col)


def assign_argmax_buckets(ds, *, emb_col: str = "embedding"):
    """Deterministic SQL-expressible quantizer: ``cluster`` = 0-based
    index of the first maximal embedding component (DuckDB:
    ``list_position(emb, list_max(emb)) - 1``).  Exists so the semantic
    pair machinery has a fully oracled surface (`semantic_pairs_scored`)
    — k-means itself is not SQL-expressible, but the exchange + capped
    tiled self-matmul + threshold emission are identical."""
    def _assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("cluster", pa.array([], pa.int64()))
        m = _embedding_matrix(t, emb_col)
        return t.append_column(
            "cluster", pa.array(np.argmax(m, axis=1).astype(np.int64),
                                pa.int64()))
    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def semantic_pairs_scored(ds, threshold: float = 0.4,
                          cfg: PipelineConfig = DEFAULT_CONFIG, *,
                          cluster_cap: int | None = None, counters=None,
                          id_col: str = "vec_id",
                          emb_col: str = "embedding"):
    """Within-argmax-bucket exact-cosine pairs ≥ threshold — the
    SemDeDup physical plan with a deterministic quantizer, so every
    emitted value is oracle-checkable in SQL (the precision leg of the
    semantic surface; recall of the learned quantizer stays a pytest
    gate in tests/test_semdedup.py).

    ``cluster_cap`` defaults to None (UNCAPPED, unlike the k-means
    surfaces): the SQL oracle emits every within-bucket pair, so a cap
    would drop cross-chunk pairs and break the exact-match contract
    once a bucket exceeds the cap.  Argmax buckets are ~N/dim rows —
    pass a cap explicitly if that per-task O(m²) is too big and the
    surface is not being oracle-checked."""
    assigned = assign_argmax_buckets(ds, emb_col=emb_col)
    return _pairs_over_clusters(assigned, threshold, cfg,
                                cluster_cap=cluster_cap, counters=counters,
                                id_col=id_col, emb_col=emb_col)


def semantic_dedup(ds, threshold: float = 0.95,
                   cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   n_clusters: int | None = None, train_sample: int = 20000,
                   cluster_cap: int = 4096, counters=None,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Corpus-out semantic dedup: keep exactly one row (min id) per
    within-cluster ≥-threshold component; all other rows pass through
    unchanged.  The survivors are decided INSIDE the cluster exchange —
    the corpus moves once and no drop set ever reaches the driver.
    Over-cap clusters use the salted sub-cell chain (`_capped_segments`);
    ids are globally unique, so one CC over the partition's whole pair
    set merges sub-cell pairs back into per-cluster components (pairs
    never cross clusters, so no spurious merges are possible)."""
    assigned, _ = assign_clusters(ds, cfg, n_clusters=n_clusters,
                                  train_sample=train_sample,
                                  id_col=id_col, emb_col=emb_col)
    n_parts = cfg.num_partitions

    def _keep(t: pa.Table | None) -> pa.Table:
        if t is None or len(t) == 0:
            return pa.table({})
        tt, ids, mat, bounds, cl_s = _cluster_segments(t, id_col, emb_col)
        segs, stats = _capped_segments(ids, cl_s, bounds, cluster_cap)
        if counters is not None and any(stats.values()):
            counters.add.remote(stats)      # settle on read, not here
        a_all, b_all = [], []
        for idx in segs:
            a, b, _cos = _pairs_in_cluster(ids[idx], mat[idx], threshold)
            if len(a):
                a_all.append(a)
                b_all.append(b)
        if not a_all:
            return tt.drop_columns(["cluster"])
        nodes, comp = label_components_arrays(
            np.concatenate(a_all), np.concatenate(b_all))
        drops = nodes[nodes != comp]          # everyone but min id
        drop_mask = np.isin(ids, drops)
        return tt.drop_columns(["cluster"]).filter(pa.array(~drop_mask))

    return hash_partition_map(assigned, "_part", _keep, n_parts,
                              map_fn=_part_by_cluster(n_parts),
                              map_chunk_rows=cfg.batch_size)
