"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix (small side) is
broadcast once via ``ray.put`` and every batch does one numpy matmul
(never re-shipped per batch; SURVEY.md §2.4 broadcast-small-side rule).
Per-batch top-k partials are then reduced to global top-k — a
pre-aggregated (combiner) pattern: the shuffle moves k rows per batch,
not every row.

Scale path: LSH-bucketed variant — random-hyperplane signs bucket the
corpus; queries probe only their own bucket (recall traded for a
shuffle-free candidate cut).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.numeric import round_half_away
from ..config import DEFAULT_CONFIG, PipelineConfig


def _embedding_matrix(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """list<float> column → (N, dim) matrix.  float64 by default so the
    cosine math agrees with the DuckDB oracle to rounding precision."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = np.asarray(arr.flatten(), dtype=dtype)
    offs = np.asarray(arr.offsets, dtype=np.int64)
    dim = int(offs[1] - offs[0])
    return flat[: len(arr) * dim].reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine top-k against a broadcast
    query matrix (loaded once per actor in __init__)."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        import ray
        q = ray.get(queries_ref)
        self.q_ids = np.asarray(q["ids"], dtype=np.int64)
        self.q_mat = _normalize(np.asarray(q["mat"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        mat = _normalize(_embedding_matrix(batch, self.emb_col))
        if len(ids) == 0 or mat.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = self.q_mat @ mat.T                      # (Q, B)
        # exclude self-matches BEFORE the partial top-k, or a query's own
        # batch would surrender one of its k slots to the query itself
        self_mask = self.q_ids[:, None] == ids[None, :]
        sims = np.where(self_mask, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]   # per-batch partial top-k
        qid = np.repeat(self.q_ids, k)
        vid = ids[top].ravel()
        cos = np.take_along_axis(sims, top, axis=1).ravel()
        return pa.table({"query_id": pa.array(qid, pa.int64()),
                         "vec_id": pa.array(vid, pa.int64()),
                         "cosine": pa.array(cos.astype(np.float64), pa.float64())})


# per-worker-process cache of the deserialized+normalized query state
# (signatures.py's stage-cache pattern): stateless elastic map tasks
# with __init__-grade reuse, no actor-pool spawn latency
_BF_STATE_CACHE: dict = {}


def ann_topk_bruteforce(ds, query_ids, k: int = 10,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k of every corpus vector for each query id
    (queries drawn from the same dataset).  → Dataset(query_id, vec_id,
    cosine) with k rows per query, excluding the query itself.

    Physical plan: query matrix broadcast once (``ray.put``); ONE
    stateless streaming map emits per-batch top-k partials already
    tagged with their query's partition (self-matches filtered
    in-kernel); one small ``hash_partition_map`` exchange reduces the
    k-rows-per-batch partials to the global per-query top-k with a
    whole-array lexsort — shuffle volume is k rows per (batch, query),
    never the corpus, and no actor pool or Ray-native groupby sits on
    the ~2 s fixed-cost path the previous plan paid."""
    import ray
    import pyarrow.compute as pc

    from ..functions.shuffle import hash_partition_map, part_of

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})

    q_tab = (ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], pa.array(list(query_ids)))),
        batch_format="pyarrow",
    ).to_arrow_refs())
    q = pa.concat_tables([ray.get(r) for r in q_tab])
    if len(q) == 0:
        import ray.data as rd
        return rd.from_arrow(empty)
    q_ref = ray.put({"ids": np.asarray(q[id_col], dtype=np.int64),
                     "mat": _embedding_matrix(q, emb_col)})
    n_parts = min(cfg.resolved_partitions(), 8)
    cache_key = (q_ref.hex(), k, id_col, emb_col)

    def _partial(batch: pa.Table) -> pa.Table:
        stage = _BF_STATE_CACHE.get(cache_key)
        if stage is None:
            # cache_key embeds the per-call q_ref: keep only the LATEST
            # entry so repeated calls don't accumulate query matrices in
            # long-lived worker processes
            _BF_STATE_CACHE.clear()
            stage = BruteForceTopK(q_ref, k, id_col, emb_col)
            _BF_STATE_CACHE[cache_key] = stage
        out = stage(batch)
        # drop -inf self rows here (tiny batches can still emit them)
        out = out.filter(pc.and_(
            pc.not_equal(out["query_id"], out["vec_id"]),
            pc.is_finite(out["cosine"])))
        qid = np.asarray(out["query_id"], dtype=np.int64)
        return out.append_column(
            "part", pa.array(part_of(qid, n_parts), pa.int64()))

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=4096)

    def _global_topk(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0 or tab.num_columns == 0:
            return empty
        qs = np.asarray(tab["query_id"], dtype=np.int64)
        vs = np.asarray(tab["vec_id"], dtype=np.int64)
        cs = np.asarray(tab["cosine"], dtype=np.float64)
        # per query: cosine desc, vec_id asc (the tie rule of the
        # previous pandas sort_values finisher, preserved bit-for-bit)
        order = np.lexsort((vs, -cs, qs))
        qs, vs, cs = qs[order], vs[order], cs[order]
        new = np.concatenate(([True], qs[1:] != qs[:-1]))
        starts = np.flatnonzero(new)
        rank = np.arange(len(qs)) - starts[np.cumsum(new) - 1]
        keep = rank < k
        return pa.table({"query_id": pa.array(qs[keep], pa.int64()),
                         "vec_id": pa.array(vs[keep], pa.int64()),
                         "cosine": pa.array(cs[keep], pa.float64())})

    return hash_partition_map(partials, "part", _global_topk, n_parts)


class HyperplaneLSH:
    """Random-hyperplane signature (stateful: planes built once per actor
    from the config seed) — buckets cosine-similar vectors together."""

    def __init__(self, dim: int, n_planes: int, seed: int,
                 id_col: str, emb_col: str, planes: str = "random"):
        if planes == "axes":
            # deterministic SQL-expressible planes: plane j = axis j, so
            # bucket bit j = (embedding[j] >= 0) — the oracle leg that
            # hash-checks the whole bucket plumbing (ann_lsh_scored);
            # production keeps the seeded random planes.
            self.planes = np.eye(dim, n_planes, dtype=np.float32)
        else:
            rng = np.random.default_rng(seed)
            self.planes = rng.standard_normal(
                (dim, n_planes)).astype(np.float32)
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        mat = _embedding_matrix(batch, self.emb_col)
        signs = (mat @ self.planes) >= 0                     # (B, P)
        weights = (1 << np.arange(signs.shape[1], dtype=np.int64))
        bucket = signs.astype(np.int64) @ weights
        return pa.table({self.id_col: pa.array(ids, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})


def _kmeans(mat: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Plain Lloyd's on normalized vectors (spherical k-means-ish),
    deterministic init by seeded choice."""
    rng = np.random.default_rng(seed)
    cents = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ann_ivf_topk(ds, query_ids, k: int = 10, *, n_clusters: int | None = None,
                 nprobe: int = 4, train_sample: int = 20000,
                 cfg: PipelineConfig = DEFAULT_CONFIG,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 quantizer: str = "kmeans"):
    """IVF approximate top-k: a coarse quantizer (spherical k-means,
    trained on a driver-side sample, centroids broadcast) routes every
    vector to its nearest centroid; each query probes only its
    ``nprobe`` nearest clusters.  The scale path vs brute force: per
    query, candidates shrink from N to ~N·nprobe/n_clusters.

    → Dataset(query_id, vec_id, cosine) — approximate: vectors outside
    the probed clusters are unseen (recall measured in tests).

    Scale behavior: the quantizer trains on a DETERMINISTIC hash-sampled
    ~``train_sample`` rows and the query vectors are pulled by a
    filtered pass — the driver only ever holds the sample + the queries,
    never the corpus (the full-table collect this replaced was the
    classic driver-materialization anti-pattern).

    ``quantizer="argmax"``: replace k-means with the deterministic
    SQL-expressible coarse cell the semantic surface already uses
    (semdedup.semantic_pairs_scored) — cell = argmax embedding
    dimension; a query probes its ``nprobe`` LARGEST dimensions (value
    desc, dim asc on ties, both sides).  Same probe/top-k machinery,
    zero training — so the whole IVF routing + probe + finisher path is
    hash-checkable against DuckDB (queries.SQL_ANN_IVF_SCORED); k-means
    recall stays a pytest gate."""
    import ray
    import pyarrow.compute as pc_

    from ..functions.hashing import splitmix64

    if quantizer not in ("kmeans", "argmax"):
        raise ValueError(f"quantizer={quantizer!r} not in"
                         f" {{'kmeans', 'argmax'}}")
    qset = np.asarray(sorted(set(query_ids)), dtype=np.int64)
    salt = np.uint64((cfg.seed * 0x9E3779B97F4A7C15) & (2**64 - 1))

    if quantizer == "argmax":
        # no training: pull ONLY the query vectors
        qtab = pa.concat_tables([t for t in ray.get(ds.map_batches(
            lambda t: t.filter(pa.array(np.isin(
                np.asarray(t[id_col], dtype=np.int64), qset))),
            batch_format="pyarrow").to_arrow_refs()) if len(t)])
        q_ids = np.asarray(qtab[id_col], dtype=np.int64)
        q_raw = _embedding_matrix(qtab, emb_col)
        q_mat = _normalize(q_raw)
        # top-nprobe dims, value desc / dim asc (stable argsort keeps
        # dim order for equal values — DuckDB mirrors with rn over
        # (val DESC, cell ASC))
        q_clusters = np.argsort(-q_raw, axis=1, kind="stable")[:, :nprobe]
        cents_ref = ray.put(None)
    else:
        n = ds.count()
        if n_clusters is None:
            n_clusters = max(2, int(np.sqrt(n)))
        frac = min(1.0, train_sample / max(n, 1))
        cut = np.uint64(min(int(frac * (2**64 - 1)), 2**64 - 1))

        def _pick(t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col], dtype=np.int64)
            keep = splitmix64(ids.view(np.uint64) ^ salt) <= cut
            keep |= np.isin(ids, qset)
            return t.filter(pa.array(keep))

        # sort_by(id): block arrival order is scheduler-dependent
        # (preserve_order=False) and seeded k-means init indexes rows —
        # sorting keeps the quantizer run-invariant.
        picked = pa.concat_tables(
            [t for t in ray.get(ds.map_batches(
                _pick, batch_format="pyarrow").to_arrow_refs())
             if len(t)]).sort_by(id_col)
        ids_p = np.asarray(picked[id_col], dtype=np.int64)
        mat_p = _normalize(_embedding_matrix(picked, emb_col))
        train_mask = splitmix64(ids_p.view(np.uint64) ^ salt) <= cut
        cents = _kmeans(mat_p[train_mask], n_clusters, iters=10,
                        seed=cfg.seed)
        cents_ref = ray.put(cents)

        q_mask = np.isin(ids_p, qset)
        q_mat = mat_p[q_mask]
        q_ids = ids_p[q_mask]
        q_clusters = np.argsort(-(q_mat @ cents.T),
                                axis=1)[:, :nprobe]  # (Q, nprobe)
    probed = np.unique(q_clusters)
    # invert once on the driver: cluster -> indices of queries probing it,
    # so the probe tasks do one matmul per (cluster, its queries) instead
    # of one Python iteration per query
    cluster_to_q = {int(c): np.unique(np.nonzero(q_clusters == c)[0])
                    for c in probed}
    q_ref = ray.put({"ids": q_ids, "mat": q_mat, "probed": probed,
                     "cluster_to_q": cluster_to_q})

    def _probe(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        raw = _embedding_matrix(batch, emb_col)
        mat = _normalize(raw)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        # argmax quantizer assigns on the RAW matrix (mirrors DuckDB
        # list_position(emb, list_max(emb)); positive scaling preserves
        # argmax but raw keeps both sides literally identical)
        assign = (np.argmax(raw, axis=1) if c is None
                  else np.argmax(mat @ c.T, axis=1))
        keep = np.isin(assign, q["probed"])
        ids, mat, assign = ids[keep], mat[keep], assign[keep]
        # group the batch's rows by assigned cluster (radix-friendly
        # stable argsort), then ONE (rows × queries-probing-cluster)
        # matmul + columnwise top-k per cluster — O(present clusters)
        # Python iterations, not O(|queries|)
        order = np.argsort(assign, kind="stable")
        ids, mat, assign = ids[order], mat[order], assign[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], assign[1:] != assign[:-1]]))
        bounds = np.append(bounds, len(assign))
        outs_q, outs_v, outs_c = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            qi = q["cluster_to_q"].get(int(assign[s]))
            if qi is None:
                continue
            sims = mat[s:e] @ q["mat"][qi].T          # (rows, nq)
            kk = min(k, e - s)
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            outs_q.append(np.repeat(q["ids"][qi], kk))
            outs_v.append(ids[s:e][top].T.ravel())
            outs_c.append(np.take_along_axis(sims, top, axis=0).T.ravel())
        if not outs_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(outs_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(outs_v), pa.int64()),
            "cosine": pa.array(np.concatenate(outs_c).astype(np.float64),
                               pa.float64()),
        })

    partials = ds.map_batches(_probe, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=4096)
    partials = partials.map_batches(
        lambda t: t.filter(pc_.not_equal(t["query_id"], t["vec_id"])),
        batch_format="pyarrow")

    def _topk(group: pd.DataFrame) -> pa.Table:
        top = group.sort_values(["cosine", "vec_id"],
                                ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top, preserve_index=False)

    return partials.groupby("query_id").map_groups(_topk, batch_format="pandas")


EMBED_BRUTE_MAX_ROWS = 200_000


def embedding_dup_pairs(ds, threshold: float = 0.4,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        n_planes: int = 8, n_tables: int = 16,
                        force: str | None = None):
    """All pairs (a<b) with cosine ≥ threshold →
    Dataset/Table(a, b, cosine_e6).

    Two physical plans behind one size gate:

    * ``brute`` (n ≤ EMBED_BRUTE_MAX_ROWS): broadcast the normalized
      corpus matrix once (ray.put), every batch does one matmul against
      it — O(N²) compute, exact; this is the oracle-checkable path.
    * ``lsh`` (the scale path): ``n_tables`` independent hyperplane-LSH
      bucketings feed the SAME bucketed candidate machinery as MinHash
      banding (stages/lsh.candidate_pairs — cap-guarded, salted), then
      candidate pairs are exactly cosine-verified against a broadcast
      endpoint-only matrix.  Recall vs brute force is gated in
      tests/test_ann.py.
    """
    import ray
    import ray.data as rd

    from ..functions.hashing import splitmix64
    from .lsh import candidate_pairs

    n = ds.count()
    mode = force or ("brute" if n <= EMBED_BRUTE_MAX_ROWS else "lsh")

    if mode == "brute":
        tabs = [ray.get(r) for r in ds.to_arrow_refs()]
        tab = pa.concat_tables([t for t in tabs if len(t)])
        ids = np.asarray(tab[id_col], dtype=np.int64)
        mat = _normalize(_embedding_matrix(tab, emb_col))
        order = np.argsort(ids, kind="stable")
        ref = ray.put({"ids": ids[order], "mat": mat[order]})

        def _pairs(batch: pa.Table) -> pa.Table:
            pk = ray.get(ref)
            bids = np.asarray(batch[id_col], dtype=np.int64)
            bmat = _normalize(_embedding_matrix(batch, emb_col))
            sims = bmat @ pk["mat"].T                     # (B, N)
            hit_b, hit_n = np.nonzero(sims >= threshold)
            a = bids[hit_b]
            b = pk["ids"][hit_n]
            keep = a < b
            cos = sims[hit_b, hit_n][keep]
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine_e6": pa.array(round_half_away(cos * 1e6).astype(np.int64),
                                      pa.int64()),
            })

        return ds.map_batches(_pairs, batch_format="pyarrow",
                              batch_size=1024)

    # --- lsh scale path ---
    first = ds.take(1)
    dim = len(first[0][emb_col])
    rng = np.random.default_rng(cfg.seed)
    planes = rng.standard_normal((dim, n_tables * n_planes)).astype(np.float64)
    planes_ref = ray.put(planes)

    def _buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        mat = _embedding_matrix(batch, emb_col)
        if len(ids) == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64())})
        signs = (mat @ pl) >= 0                         # (B, T*P)
        signs = signs.reshape(len(ids), n_tables, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        buckets = signs.astype(np.int64) @ weights      # (B, T)
        # mix the table index in so tables never collide
        keys = np.asarray(splitmix64(
            (buckets + (np.arange(n_tables, dtype=np.int64)
                        << np.int64(40))).astype(np.int64).view(np.uint64)
            .ravel())).view(np.int64)
        return pa.table({
            "band_key": pa.array(keys, pa.int64()),
            id_col: pa.array(np.repeat(ids, n_tables), pa.int64()),
        })

    band_ds = ds.map_batches(_buckets, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=4096)
    cands = candidate_pairs(band_ds, cfg, id_col=id_col).materialize()
    if cands.count() == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "cosine_e6": pa.array([], pa.int64())}))

    # endpoint-only matrix broadcast for exact cosine verification
    ctabs = [t for t in ray.get(list(
        cands.select_columns(["a", "b"]).to_arrow_refs())) if len(t)]
    ctab = pa.concat_tables(ctabs)
    need = np.unique(np.concatenate([
        np.asarray(ctab["a"], dtype=np.int64),
        np.asarray(ctab["b"], dtype=np.int64)]))

    def _pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        pos = np.clip(np.searchsorted(need, ids), 0, max(len(need) - 1, 0))
        return t.filter(pa.array(need[pos] == ids))

    ptabs = [t for t in ray.get(list(ds.map_batches(
        _pick, batch_format="pyarrow").to_arrow_refs())) if len(t)]
    ptab = pa.concat_tables(ptabs)
    pids = np.asarray(ptab[id_col], dtype=np.int64)
    order = np.argsort(pids, kind="stable")
    vref = ray.put({"ids": pids[order],
                    "mat": _normalize(_embedding_matrix(ptab, emb_col))[order]})

    def _verify(batch: pa.Table) -> pa.Table:
        pk = ray.get(vref)
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        ia = np.searchsorted(pk["ids"], a)
        ib = np.searchsorted(pk["ids"], b)
        cos = np.einsum("ij,ij->i", pk["mat"][ia], pk["mat"][ib])
        keep = cos >= threshold
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "cosine_e6": pa.array(round_half_away(cos[keep] * 1e6).astype(np.int64),
                                  pa.int64()),
        })

    return cands.map_batches(_verify, batch_format="pyarrow")


def ann_lsh_buckets(ds, dim: int, n_planes: int = 12,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    planes: str = "random"):
    """→ Dataset(vec_id, bucket): hyperplane-LSH bucket per vector; the
    scale path's candidate cut (probe = same-bucket members only).
    ``planes="axes"`` swaps in the deterministic axis planes (oracle
    leg, same stage/actor path)."""
    return ds.map_batches(
        HyperplaneLSH, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(dim, n_planes, cfg.seed, id_col, emb_col,
                             planes),
        concurrency=(1, 8), batch_size=4096,
    )
