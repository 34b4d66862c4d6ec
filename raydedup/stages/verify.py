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
    """pairs(a,b) ⋈ sets on a, then on b → (a, b, set_a, set_b)."""
    side = sig_ds.select_columns([id_col, set_col])
    a_side = side.rename_columns({id_col: "a", set_col: "set_a"})
    b_side = side.rename_columns({id_col: "b", set_col: "set_b"})
    out = pairs_ds.join(a_side, join_type="inner",
                        num_partitions=cfg.num_partitions, on=("a",))
    out = out.join(b_side, join_type="inner",
                   num_partitions=cfg.num_partitions, on=("b",))
    return out


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
    tab = pa.concat_tables([t for t in tabs if len(t)])
    vals, offs = binary_to_sets(tab[set_col])
    ids = np.asarray(tab[id_col], dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    lens = (offs[1:] - offs[:-1])[order]
    new_offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_offs[1:])
    total = int(new_offs[-1])
    gather = (np.repeat(offs[:-1][order], lens)
              + (np.arange(total) - np.repeat(new_offs[:-1], lens)))
    return {"ids": ids[order], "offsets": new_offs, "values": vals[gather]}


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
        # direct-probe index (values < 2^32 only, e.g. graph ids): the
        # reference's Is-kernel searches the SHARED CSR instead of
        # materializing both rows per pair (jaccard.cpp:353-367).  Keys
        # (row_rank << 32 | value) over the whole pack are globally
        # ascending, so ONE searchsorted per batch probes every pair —
        # per-pair cost min_deg·log, immune to hub skew.
        vals = self.pack["values"]
        self._rowlens = self.pack["offsets"][1:] - self.pack["offsets"][:-1]
        if self.weights is None and len(vals) and vals.max() < (1 << 32) \
                and len(self._rowlens) < (1 << 31):
            rank = np.repeat(np.arange(len(self._rowlens), dtype=np.uint64),
                             self._rowlens)
            self._tkey = (rank << np.uint64(32)) | vals
        else:
            self._tkey = None

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
        av, ao = _gather_csr(self.pack, a)
        bv, bo = _gather_csr(self.pack, b)
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


VERIFY_BROADCAST_MAX_PAIRS = 1_000_000


def verify_pairs(pairs_ds, sig_ds, cfg: PipelineConfig,
                 threshold: float | None = ..., id_col: str = "doc_id",
                 set_col: str = "shingles", assume_small: bool | None = None):
    """Full verification: gather both shingle sets per pair, score, filter.

    Physical plan choice: when the candidate set is small (the common
    case — verified candidates are a tiny fraction of the corpus), the
    needed signature rows are filtered by a broadcast id-set and scored
    broadcast-side (zero shuffle joins).  Above the threshold — the
    10^12-doc path — pairs flow through two hash-partitioned joins on
    doc_id.  ``assume_small=False`` forces the join path without
    counting (counting materializes the candidate pipeline once).
    """
    if assume_small is None or assume_small:
        pairs_ds = pairs_ds.materialize()
        small = (assume_small
                 or pairs_ds.count() <= VERIFY_BROADCAST_MAX_PAIRS)
        if small:
            import ray
            tab = pa.concat_tables(
                [t for t in (ray.get(r) for r in
                             pairs_ds.select_columns(["a", "b"]).to_arrow_refs())
                 if len(t)]) if pairs_ds.count() else None
            if tab is None or len(tab) == 0:
                return score_pairs(
                    _empty_joined(), cfg, threshold=threshold)
            need = np.unique(np.concatenate([
                np.asarray(tab["a"], dtype=np.int64),
                np.asarray(tab["b"], dtype=np.int64)]))
            need_arr = pa.array(need, type=pa.int64())
            sub = sig_ds.map_batches(
                lambda t, na=need_arr: t.filter(pc.is_in(t[id_col],
                                                         value_set=na)),
                batch_format="pyarrow",
            )
            return verify_pairs_broadcast(pairs_ds, sub, cfg,
                                          threshold=(cfg.verify_threshold
                                                     if threshold is ...
                                                     else threshold),
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
