"""Exact-Jaccard re-verification of candidate pairs.

The reference's pair-list API (``jaccard_list`` /
``Jaccard_IsPairsKernel``, jaccard.cpp:462-605, 901-923) scores an
explicit (first[], second[]) pair list by gathering both adjacency rows
and intersecting them.  Here the "gather" is two hash-partitioned joins
(pair.a → shingles, pair.b → shingles; shuffle key = doc_id) and the
"intersect" is the batched merge-count kernel
(functions/setops.py) — pure vectorized map, no atomics (SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.setops import pairwise_jaccard
from ..functions.text import binary_to_sets


def attach_sets(pairs_ds, sig_ds, cfg: PipelineConfig, id_col: str = "doc_id",
                set_col: str = "shingles"):
    """pairs(a,b) ⋈ sets on a, then on b → (a, b, set_a, set_b).

    Implemented as two partitioned hash joins built from ONE
    low-cardinality ``groupby(part)`` shuffle each (union the tagged
    pair rows with the set rows keyed by the same hash partition, then a
    vectorized searchsorted join inside each partition).  Ray's native
    ``Dataset.join`` is avoided: its per-partition aggregator actors
    measured several times slower at every scale we bench."""
    out = _attach_one_side(pairs_ds, sig_ds, cfg, "a", "set_a",
                           id_col=id_col, set_col=set_col)
    return _attach_one_side(out, sig_ds, cfg, "b", "set_b",
                            id_col=id_col, set_col=set_col)


def _sort_sig_block(tab):
    """Reduce fn for the signature exchange: one sorted (id, blob) block
    per hash partition, ready for searchsorted lookups."""
    if tab is None or len(tab) == 0:
        return pa.table({"id": pa.array([], pa.int64()),
                         "blob": pa.array([], pa.large_binary())})
    order = np.argsort(np.asarray(tab["id"], dtype=np.int64), kind="stable")
    return tab.take(pa.array(order, pa.int64()))


def attach_and_score(pairs_ds, sig_ds, cfg: PipelineConfig, threshold,
                     id_col: str = "doc_id", set_col: str = "shingles",
                     sig_blocks=None):
    """Large-candidate verification over raw Ray tasks, one signature
    shuffle total:

      sig      ──hash(id)──►  P static blocks            (shuffled ONCE)
      pairs    ──hash(a)───►  gather set_a from block p  (pass 1)
               ──hash(b)───►  gather set_b from block p,
                              score + filter immediately  (pass 2, fused)

    Both passes look sets up in the SAME static partitioned signature
    blocks (co-partitioned by one hash), so the heavy side never moves
    twice and the (set_a, set_b) double-blob intermediate never exists.

    ``sig_blocks``: optionally, the P pre-built sorted (id, blob) block
    refs (hash_partition_map(..., _sort_sig_block, P) output with the
    SAME n_parts/hash) — lets callers fuse set (re)computation into that
    exchange's split tasks; ``sig_ds`` is ignored then.
    """
    import ray
    import ray.data as rd

    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()

    def _hashp(x: np.ndarray) -> np.ndarray:
        return (splitmix64(x.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)

    if sig_blocks is None:
        # --- static signature partitions (sorted by id) ---
        def _tag_sig(t: pa.Table) -> pa.Table:
            ids = np.asarray(t[id_col], dtype=np.int64)
            return pa.table({
                "id": pa.array(ids, pa.int64()),
                "blob": t[set_col].cast(pa.large_binary())
                if not pa.types.is_large_binary(t.schema.field(set_col).type)
                else t[set_col],
                "part": pa.array(_hashp(ids), pa.int64()),
            })

        sig_tagged = sig_ds.select_columns([id_col, set_col]).map_batches(
            _tag_sig, batch_format="pyarrow", zero_copy_batch=True)
        sig_blocks = hash_partition_map(sig_tagged, "part", _sort_sig_block,
                                        n_parts).to_arrow_refs()
    elif len(sig_blocks) != n_parts:
        raise ValueError(f"sig_blocks has {len(sig_blocks)} blocks, "
                         f"expected n_parts={n_parts}")

    # --- pass 0: split pairs by hash(a) ---
    def _tag_pairs(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"], dtype=np.int64)
        return pa.table({"a": t["a"], "b": t["b"],
                         "part": pa.array(_hashp(a), pa.int64())})

    def _dedup_pairs(tab):
        # all copies of a pair share hash(a) → land here together; dedup
        # is free in this partition (lets candidate_pairs skip its own
        # global dedup shuffle — dedup="local")
        if tab is None or len(tab) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        pk = np.stack([np.asarray(tab["a"], dtype=np.int64),
                       np.asarray(tab["b"], dtype=np.int64)], axis=1)
        pk = np.unique(pk, axis=0)
        return pa.table({"a": pa.array(pk[:, 0], pa.int64()),
                         "b": pa.array(pk[:, 1], pa.int64())})

    pairs_p = hash_partition_map(
        pairs_ds.map_batches(_tag_pairs, batch_format="pyarrow",
                             zero_copy_batch=True),
        "part", _dedup_pairs, n_parts).to_arrow_refs()

    def _lookup_blobs(sig_tab, keys):
        sid = np.asarray(sig_tab["id"], dtype=np.int64)
        pos = np.searchsorted(sid, keys)
        pos = np.clip(pos, 0, max(len(sid) - 1, 0))
        ok = sid[pos] == keys if len(sid) else np.zeros(len(keys), bool)
        return ok, pos

    # --- pass 1: attach set_a, re-split by hash(b) ---
    @ray.remote(num_returns=n_parts)
    def _pass1(pair_tab, sig_tab):
        a = np.asarray(pair_tab["a"], dtype=np.int64)
        b = np.asarray(pair_tab["b"], dtype=np.int64)
        ok, pos = _lookup_blobs(sig_tab, a)
        a, b, pos = a[ok], b[ok], pos[ok]
        blobs = sig_tab["blob"].combine_chunks().take(
            pa.array(pos, pa.int64()))
        part = _hashp(b)
        order = np.argsort(part, kind="stable")
        bounds = np.searchsorted(part[order], np.arange(n_parts + 1))
        tab = pa.table({"a": pa.array(a[order], pa.int64()),
                        "b": pa.array(b[order], pa.int64()),
                        "set_a": blobs.take(pa.array(order, pa.int64()))})
        return tuple(tab.slice(bounds[p], bounds[p + 1] - bounds[p])
                     for p in range(n_parts))

    # --- pass 2: attach set_b, score, filter — fused ---
    @ray.remote
    def _pass2(sig_tab, *half_tabs):
        tabs = [t for t in half_tabs if len(t)]
        empty = pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "intersection": pa.array([], pa.int64()),
            "union": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        })
        if not tabs:
            return empty
        tab = pa.concat_tables(tabs)
        b = np.asarray(tab["b"], dtype=np.int64)
        ok, pos = _lookup_blobs(sig_tab, b)
        tab = tab.filter(pa.array(ok))
        blob_b = sig_tab["blob"].combine_chunks().take(
            pa.array(pos[ok], pa.int64()))
        outs = []
        for i in range(0, len(tab), 8192):   # n·log n kernel: chunk
            sl = tab.slice(i, 8192)
            av, ao = binary_to_sets(sl["set_a"])
            bv, bo = binary_to_sets(blob_b.slice(i, 8192))
            inter, union, j = pairwise_jaccard(av, ao, bv, bo)
            t = pa.table({
                "a": sl["a"], "b": sl["b"],
                "intersection": pa.array(inter, pa.int64()),
                "union": pa.array(union, pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            })
            if threshold is not None:
                t = t.filter(pc.greater_equal(t["jaccard"],
                                              pa.scalar(threshold)))
            outs.append(t)
        return pa.concat_tables(outs) if outs else empty

    half = [_pass1.remote(pairs_p[p], sig_blocks[p]) for p in range(n_parts)]
    if n_parts == 1:
        half = [[h] for h in half]
    scored = [_pass2.remote(sig_blocks[q], *[h[q] for h in half])
              for q in range(n_parts)]
    return rd.from_arrow_refs(scored)


def _attach_one_side(pairs_ds, sig_ds, cfg: PipelineConfig, key: str,
                     out_col: str, id_col: str, set_col: str,
                     score_threshold=...):
    from ..functions.hashing import splitmix64

    n_parts = cfg.resolved_partitions()
    pair_schema = pairs_ds.schema()
    pair_cols = list(pair_schema.names)
    pair_types = dict(zip(pair_schema.names, pair_schema.types))
    # unified row layout: pair columns + out_col + part + _isset

    def _tag_pairs(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key], dtype=np.int64)
        part = (splitmix64(k.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        cols = {c: t[c] for c in pair_cols}
        cols[out_col] = pa.nulls(len(t), pa.large_binary())
        cols["part"] = pa.array(part, pa.int64())
        cols["_isset"] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    def _tag_sets(t: pa.Table) -> pa.Table:
        k = np.asarray(t[id_col], dtype=np.int64)
        part = (splitmix64(k.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        blob = t[set_col]
        if not pa.types.is_large_binary(blob.type):
            blob = blob.cast(pa.large_binary())
        cols = {}
        for c in pair_cols:
            cols[c] = (pa.array(k, pair_types[c]) if c == key
                       else pa.nulls(len(t), pair_types[c]))
        cols[out_col] = blob
        cols["part"] = pa.array(part, pa.int64())
        cols["_isset"] = pa.array(np.ones(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    tagged_pairs = pairs_ds.map_batches(_tag_pairs, batch_format="pyarrow",
                                        zero_copy_batch=True)
    tagged_sets = sig_ds.select_columns([id_col, set_col]).map_batches(
        _tag_sets, batch_format="pyarrow", zero_copy_batch=True)

    _SCORED_EMPTY = pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "intersection": pa.array([], pa.int64()),
        "union": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    })

    def _score_fused(pairs_tab: pa.Table, blobs) -> pa.Table:
        out_parts = []
        n = len(pairs_tab)
        for i in range(0, n, 8192):   # chunk: the kernel is n·log n
            sl = pairs_tab.slice(i, 8192)
            av, ao = binary_to_sets(sl["set_a"])
            bv, bo = binary_to_sets(blobs.slice(i, 8192))
            inter, union, j = pairwise_jaccard(av, ao, bv, bo)
            t = pa.table({
                "a": sl["a"], "b": sl["b"],
                "intersection": pa.array(inter, pa.int64()),
                "union": pa.array(union, pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            })
            if score_threshold is not None:
                t = t.filter(pc.greater_equal(t["jaccard"],
                                              pa.scalar(score_threshold)))
            out_parts.append(t)
        return pa.concat_tables(out_parts) if out_parts else _SCORED_EMPTY

    def _join(group: pa.Table | None) -> pa.Table:
        fused = score_threshold is not ...
        if group is None or len(group) == 0:
            if fused:
                return _SCORED_EMPTY
            return pa.table({
                **{c: pa.array([], pair_types[c]) for c in pair_cols},
                out_col: pa.array([], pa.large_binary()),
            })
        isset = np.asarray(group["_isset"], dtype=np.int8) == 1
        sets_tab = group.filter(pa.array(isset))
        pairs_tab = group.filter(pa.array(~isset))
        if len(pairs_tab) == 0:
            return _SCORED_EMPTY if fused else _empty_like(pairs_tab)
        sid = np.asarray(sets_tab[key], dtype=np.int64)
        order = np.argsort(sid, kind="stable")
        sid_sorted = sid[order]
        pk = np.asarray(pairs_tab[key], dtype=np.int64)
        pos = np.searchsorted(sid_sorted, pk)
        pos = np.clip(pos, 0, max(len(sid_sorted) - 1, 0))
        found = sid_sorted[pos] == pk if len(sid_sorted) else \
            np.zeros(len(pk), dtype=bool)
        pairs_tab = pairs_tab.filter(pa.array(found))
        take_idx = order[pos[found]]
        blobs = sets_tab[out_col].combine_chunks().take(
            pa.array(take_idx, pa.int64()))
        if fused:
            return _score_fused(pairs_tab, blobs)
        keep = [c for c in pairs_tab.column_names
                if c not in ("part", "_isset", out_col)]
        out = pa.table({**{c: pairs_tab[c] for c in keep}, out_col: blobs})
        return out

    def _empty_like(pairs_tab: pa.Table) -> pa.Table:
        keep = [c for c in pairs_tab.column_names if c != "_isset"]
        return pa.table({c: pairs_tab[c] for c in keep})

    from ..functions.shuffle import hash_partition_map
    both = tagged_pairs.union(tagged_sets)
    return hash_partition_map(both, "part", _join, n_parts)


def score_pairs(joined_ds, cfg: PipelineConfig | None = None,
                threshold: float | None = ...):
    """(a, b, set_a, set_b) → (a, b, intersection, union, jaccard),
    filtered to jaccard ≥ threshold.  ``threshold=...`` (default) takes
    cfg.verify_threshold; ``threshold=None`` disables the filter."""
    if threshold is ...:
        thr = cfg.verify_threshold if cfg is not None else None
    else:
        thr = threshold

    def _score(batch: pa.Table) -> pa.Table:
        if len(batch) > 8192:
            # n·log n kernel: keep slices small even under operator fusion
            return pa.concat_tables([_score(batch.slice(i, 8192))
                                     for i in range(0, len(batch), 8192)])
        av, ao = binary_to_sets(batch["set_a"])
        bv, bo = binary_to_sets(batch["set_b"])
        inter, union, j = pairwise_jaccard(av, ao, bv, bo)
        out = pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "intersection": pa.array(inter, type=pa.int64()),
            "union": pa.array(union, type=pa.int64()),
            "jaccard": pa.array(j, type=pa.float64()),
        })
        if thr is not None:
            out = out.filter(pc.greater_equal(out["jaccard"], pa.scalar(thr)))
        return out

    # explicit batch_size: the merge-count kernel is n·log n and cache
    # sensitive — scoring whole 100k-row blocks in one lexsort is several
    # times slower per pair than 8k slices
    return joined_ds.map_batches(_score, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=8192)


def pack_sets(sets_ds, id_col: str, set_col: str) -> dict:
    """Collect a (id, blob) Dataset into one driver-side CSR pack
    {ids(sorted), offsets, values} for broadcast.  Only for sides small
    enough to replicate (the broadcast-small-side rule) — callers gate
    on row count."""
    import ray
    from ..functions.text import binary_to_sets

    tabs = [ray.get(r) for r in
            sets_ds.select_columns([id_col, set_col]).to_arrow_refs()]
    tabs = [t for t in tabs if len(t)]
    if not tabs:
        return {"ids": np.empty(0, np.int64),
                "offsets": np.zeros(1, np.int64),
                "values": np.empty(0, np.uint64), "tkey": None}
    tab = pa.concat_tables(tabs)
    vals, offs = binary_to_sets(tab[set_col])
    ids = np.asarray(tab[id_col], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    lens = (offs[1:] - offs[:-1])[order]
    new_offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_offs[1:])
    total = int(new_offs[-1])
    gather = (np.repeat(offs[:-1][order], lens)
              + (np.arange(total) - np.repeat(new_offs[:-1], lens)))
    pack = {"ids": ids[order], "offsets": new_offs, "values": vals[gather]}
    pack["tkey"] = _build_probe_index(pack)
    return pack


def _build_probe_index(pack: dict) -> np.ndarray | None:
    """Global (row_rank << 32 | value) probe key for the direct-probe
    kernel — only when values already fit 32 bits (graph vertex ids).
    Full-range 64-bit shingle hashes stay on the distributed merge-count
    kernel: dictionary-encoding them costs a serial driver-side sort of
    every pack value, which measured slower than just scoring the pairs
    across workers."""
    values = pack["values"]
    n_rows = len(pack["ids"])
    if (len(values) == 0 or n_rows >= (1 << 31)
            or values.max() >= (1 << 32)):
        return None
    rowlens = pack["offsets"][1:] - pack["offsets"][:-1]
    rank = np.repeat(np.arange(n_rows, dtype=np.uint64), rowlens)
    return (rank << np.uint64(32)) | values


def _gather_csr(pack: dict, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized lookup: CSR rows of ``keys`` from a broadcast pack.
    Missing keys get empty rows."""
    ids, offs, vals = pack["ids"], pack["offsets"], pack["values"]
    idx = np.searchsorted(ids, keys)
    idx = np.clip(idx, 0, len(ids) - 1)
    found = ids[idx] == keys
    starts = np.where(found, offs[idx], 0)
    lens = np.where(found, offs[idx + 1] - offs[idx], 0)
    out_offs = np.zeros(len(keys) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    total = int(out_offs[-1])
    gather = (np.repeat(starts, lens)
              + (np.arange(total) - np.repeat(out_offs[:-1], lens)))
    return vals[gather], out_offs


class BroadcastPairScorer:
    """Actor-pool stage: scores (a, b) pairs against a broadcast set pack
    (loaded once per actor via ray.get) — no shuffle join.  Used when the
    set side is small (e.g. graph adjacency); the shuffle-join path
    (attach_sets) is the scale path for corpus-sized sides."""

    def __init__(self, pack_ref, threshold=None, weights_ref=None):
        import ray
        self.pack = ray.get(pack_ref)
        self.threshold = threshold
        self.weights = ray.get(weights_ref) if weights_ref is not None else None
        # direct-probe index: the reference's Is-kernel searches the
        # SHARED CSR instead of materializing both rows per pair
        # (jaccard.cpp:353-367).  Keys (row_rank << 32 | value32) over
        # the whole pack are globally ascending, so ONE searchsorted per
        # batch probes every pair — per-pair cost min_deg·log, immune to
        # hub skew.  Built once at pack time (_build_probe_index);
        # weighted scoring needs original element values, so it takes
        # the row-materializing path.
        self._rowlens = self.pack["offsets"][1:] - self.pack["offsets"][:-1]
        self._tkey = self.pack.get("tkey") if self.weights is None else None

    def _score_direct(self, batch: pa.Table) -> pa.Table:
        pack = self.pack
        ids, offs = pack["ids"], pack["offsets"]
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        ra = np.searchsorted(ids, a)
        rb = np.searchsorted(ids, b)
        ra = np.clip(ra, 0, len(ids) - 1)
        rb = np.clip(rb, 0, len(ids) - 1)
        ok_a, ok_b = ids[ra] == a, ids[rb] == b
        la = np.where(ok_a, self._rowlens[ra], 0)
        lb = np.where(ok_b, self._rowlens[rb], 0)
        swap = la > lb
        probe_row = np.where(swap, rb, ra)      # smaller row is iterated
        target_row = np.where(swap, ra, rb)     # larger row is searched
        probe_lens = np.where(swap, lb, la)
        p_offs = np.zeros(len(a) + 1, dtype=np.int64)
        np.cumsum(probe_lens, out=p_offs[1:])
        total = int(p_offs[-1])
        intra = np.arange(total, dtype=np.int64) - np.repeat(p_offs[:-1],
                                                             probe_lens)
        src = np.repeat(offs[:-1][probe_row], probe_lens) + intra
        pvals = pack["values"][src]
        pid = np.repeat(np.arange(len(a), dtype=np.int64), probe_lens)
        pkey = (np.repeat(target_row.astype(np.uint64), probe_lens)
                << np.uint64(32)) | pvals
        pos = np.searchsorted(self._tkey, pkey)
        pos = np.minimum(pos, max(len(self._tkey) - 1, 0))
        found = self._tkey[pos] == pkey
        inter = np.bincount(pid[found], minlength=len(a)).astype(np.int64)
        union = la + lb - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        out = pa.table({
            "a": batch["a"], "b": batch["b"],
            "intersection": pa.array(inter, pa.int64()),
            "union": pa.array(union, pa.int64()),
            "jaccard": pa.array(j, pa.float64()),
        })
        if self.threshold is not None:
            out = out.filter(pc.greater_equal(out["jaccard"],
                                              pa.scalar(self.threshold)))
        return out

    CHUNK = 8192  # the merge-count kernel is n·log n: score in slices
    # even when operator fusion hands us a whole block as one batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._tkey is not None:
            return self._score_direct(batch)
        if len(batch) > self.CHUNK:
            parts = [self(batch.slice(i, self.CHUNK))
                     for i in range(0, len(batch), self.CHUNK)]
            return pa.concat_tables(parts)
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        pack = self.pack
        if self.weights is not None and "values_raw" in pack:
            # weighted lookups key on original element values, not ranks
            pack = {**pack, "values": pack["values_raw"]}
        av, ao = _gather_csr(pack, a)
        bv, bo = _gather_csr(pack, b)
        if self.weights is None:
            inter, union, j = pairwise_jaccard(av, ao, bv, bo)
            out = pa.table({
                "a": batch["a"], "b": batch["b"],
                "intersection": pa.array(inter, pa.int64()),
                "union": pa.array(union, pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            })
        else:
            from ..functions.setops import pairwise_weighted_jaccard
            wi, wu, j = pairwise_weighted_jaccard(av, ao, bv, bo,
                                                  weight_of=self.weights)
            out = pa.table({
                "a": batch["a"], "b": batch["b"],
                "weight_i": pa.array(wi, pa.float64()),
                "weight_u": pa.array(wu, pa.float64()),
                "jaccard": pa.array(j, pa.float64()),
            })
        if self.threshold is not None:
            out = out.filter(pc.greater_equal(out["jaccard"],
                                              pa.scalar(self.threshold)))
        return out


def verify_pairs_broadcast(pairs_ds, sets_ds, cfg: PipelineConfig,
                           threshold=None, id_col: str = "doc_id",
                           set_col: str = "shingles", weights=None):
    """Broadcast-side verification: the packed sets go into the object
    store ONCE (ray.put); every scoring task reads them zero-copy from
    local plasma (ray.get of a shared object).  Stateless tasks, not an
    actor pool — the state costs nothing to "load", and tasks give the
    streaming executor full elasticity."""
    import ray
    pack_ref = ray.put(pack_sets(sets_ds, id_col, set_col))
    weights_ref = (ray.put(np.asarray(weights, dtype=np.float64))
                   if weights is not None else None)

    def _score(batch: pa.Table) -> pa.Table:
        scorer = BroadcastPairScorer(pack_ref, threshold=threshold,
                                     weights_ref=weights_ref)
        return scorer(batch)

    # batch_size=None: one task per input block (a batch_size here would
    # make the executor bundle several small upstream blocks into one
    # giant serial task); the scorer slices internally for the kernel
    return pairs_ds.map_batches(_score, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)


def _cpus() -> int:
    import ray
    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


VERIFY_BROADCAST_MAX_PAIRS = 200_000  # above this, the needed signature
# subset gets too big to collect on the driver — use the shuffle joins
SEMI_FILTER_MAX_PAIRS = 50_000_000    # endpoint-id semi-join prune cap


def verify_pairs(pairs_ds, sig_ds, cfg: PipelineConfig,
                 threshold: float | None = ..., id_col: str = "doc_id",
                 set_col: str = "shingles", assume_small: bool | None = None,
                 sig_prefiltered: bool = False):
    """Full verification: gather both shingle sets per pair, score, filter.

    Physical plan choice: when the candidate set is small (the common
    case — verified candidates are a tiny fraction of the corpus), the
    needed signature rows are filtered by a broadcast id-set and scored
    broadcast-side (zero shuffle joins).  Above the threshold — the
    10^12-doc path — pairs flow through two hash-partitioned joins on
    doc_id.  ``assume_small=False`` forces the join path without
    counting (counting materializes the candidate pipeline once).
    ``sig_prefiltered=True`` declares sig_ds already pruned to the
    candidate endpoints — skips the endpoint collect + semi-filter this
    wrapper would otherwise redo (callers on pre-semi'd inputs).
    """
    thr = cfg.verify_threshold if threshold is ... else threshold
    if assume_small is None or assume_small:
        pairs_ds = pairs_ds.materialize()
        n_pairs = pairs_ds.count()
        if n_pairs == 0:
            return score_pairs(_empty_joined(), cfg, threshold=threshold)
        need_arr = None
        if not sig_prefiltered and (assume_small
                                    or n_pairs <= SEMI_FILTER_MAX_PAIRS):
            # semi-join: collect the candidate endpoint ids (two int64
            # columns — small even for millions of pairs) and prune the
            # signature side to just the needed rows before any gather
            import ray
            tab = pa.concat_tables(
                [t for t in (ray.get(r) for r in
                             pairs_ds.select_columns(["a", "b"]).to_arrow_refs())
                 if len(t)])
            need = np.unique(np.concatenate([
                np.asarray(tab["a"], dtype=np.int64),
                np.asarray(tab["b"], dtype=np.int64)]))

            def _semi(t, nd=need):
                # sorted-array membership: pc.is_in would rebuild its
                # hash set from the (large) value list on every batch
                ids = np.asarray(t[id_col], dtype=np.int64)
                pos = np.searchsorted(nd, ids)
                pos = np.clip(pos, 0, max(len(nd) - 1, 0))
                return t.filter(pa.array(nd[pos] == ids))

            sig_ds = sig_ds.map_batches(_semi, batch_format="pyarrow")
        if assume_small or n_pairs <= VERIFY_BROADCAST_MAX_PAIRS:
            return verify_pairs_broadcast(pairs_ds, sig_ds, cfg,
                                          threshold=thr,
                                          id_col=id_col, set_col=set_col)
        return attach_and_score(pairs_ds, sig_ds, cfg, thr,
                                id_col=id_col, set_col=set_col)
    joined = attach_sets(pairs_ds, sig_ds, cfg, id_col=id_col, set_col=set_col)
    return score_pairs(joined, cfg, threshold=threshold)


def _empty_joined():
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
        "set_a": pa.array([], pa.large_binary()),
        "set_b": pa.array([], pa.large_binary()),
    }))
