"""Exact all-pairs Jaccard similarity join via prefix filtering.

The EXACT counterpart of the MinHash-LSH tier: candidate recall is 1.0
by construction (the prefix-filter theorem — Chaudhuri et al., "A
Primitive Operator for Similarity Joins", ICDE 2006; Bayardo et al.,
"Scaling Up All Pairs Similarity Search", WWW 2007; Vernica et al.,
"Efficient Parallel Set-Similarity Joins Using MapReduce", SIGMOD
2010), so the verified output IS the complete ``J >= t`` pair set.
This gives the engine its cross-implementation agreement surface — the
reference's EC-vs-VC two-implementations-one-answer design
(run_proteus.sh:18-19, compareCoords.cpp:198-318) reborn: the
probabilistic LSH tier's recall is asserted against this tier's exact
truth in tests/test_allpairs.py.

Theorem (why recall is exactly 1.0): fix any total order on tokens and
let ``prefix(x)`` be the first ``|x| - ceil(t*|x|) + 1`` tokens of x.
``J(x,y) >= t`` implies ``|x ∩ y| >= t/(1+t) * (|x|+|y|) >= t*|x|``
for BOTH sides (using ``|y| >= t*|x|``, forced by J <= |y|/|x|), so at
most ``ceil(t*|x|) - 1`` shared tokens can sit after x's prefix — at
least one shared token lies inside EACH side's prefix.  Every
qualifying pair therefore collides in some prefix-token bucket.

Physical plan (same exchange idioms as the LSH tier, lsh.py:196):

  1. per-doc sorted-unique token sets (one stateless map; binary wire
     format shared with the verify kernel);
  2. [order="df"] token document frequencies by a combiner exchange
     (per-chunk partial counts → per-partition sums); only ``df >= 2``
     tokens are kept — a df=1 token can never be SHARED, and shared
     tokens are the only ones the theorem needs, so df=1 tokens still
     occupy prefix slots but are never emitted.  The df map is
     broadcast (ray.put + worker-local cache); above
     ``df_broadcast_max`` entries it falls back to order="hash" with a
     warning (selectivity changes, exactness does not — the prefix
     order only shapes CANDIDATE volume);
  3. prefix emission: tokens of each doc ordered ascending by
     (df, token) — rarest first — and the first ``p`` emitted as
     (token, doc_id) rows, partitioned by token hash;
  4. within-partition run sort + vectorized all-pairs emission
     (lsh._all_pairs_of_runs), local dedup, then the global pair-hash
     dedup exchange;
  5. exact verification re-uses verify_pairs (the reference's
     Jaccard_IsPairsKernel recast, jaccard.cpp:462-540) over the SAME
     set column — scores are sorted-set-intersection exact.

Skew honesty: a B-member bucket of near-identical docs has ~B²/2
genuinely-qualifying pairs — no exact algorithm can avoid the
quadratic OUTPUT.  ``max_bucket`` (default 20k) raises with a pointer
to the LSH tier (whose salted overlap chains + connected components
represent such floods in linear space) instead of silently attempting
a trillion-row emission.
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array
from ..functions.text import binary_to_sets, sets_to_binary
from .lsh import _all_pairs_of_runs, _intra


def doc_token_sets(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   sep: str = " ", hash_family: str = "fnv"):
    """Per-doc sorted-unique token-hash sets in the binary wire format
    (``(id_col, n_set:int64, tokens:large_binary)``) — word-level sets
    for the all-pairs join, sharing verify's set conventions."""
    from .cardinality import _resolve_hasher
    hasher = _resolve_hasher(hash_family)

    def _sets(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col].combine_chunks(), "")
        toks = pc.split_pattern(texts, pattern=sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        tv = toks.values
        hv = hasher(tv)
        # drop empty tokens (split artifacts), then sorted-unique per doc
        ne = pc.not_equal(tv, "")
        if isinstance(ne, pa.ChunkedArray):
            ne = ne.combine_chunks()
        nonempty = np.asarray(ne)
        n_docs = len(t)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64),
                            offs[1:] - offs[:-1])
        doc_idx, hv = doc_idx[nonempty], hv[nonempty]
        order = np.lexsort((hv, doc_idx))
        d, h = doc_idx[order], hv[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        d, h = d[keep], h[keep]
        counts = np.bincount(d, minlength=n_docs)
        offsets = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return pa.table({
            id_col: t[id_col],
            "n_set": pa.array(counts.astype(np.int64), pa.int64()),
            "tokens": sets_to_binary(h, offsets),
        })

    return docs_ds.map_batches(_sets, batch_format="pyarrow",
                               batch_size=cfg.batch_size,
                               zero_copy_batch=True)


def _df_broadcast(sets_ds, cfg: PipelineConfig, set_col: str,
                  df_broadcast_max: int):
    """df>=2 token map as a broadcast ref of (tokens_sorted:uint64,
    df:int64), or None when it exceeds ``df_broadcast_max`` entries.
    Combiner exchange: each chunk ships one partial count per distinct
    token it contains; partitions sum and drop singletons."""
    import ray

    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()

    def _partial(t: pa.Table) -> pa.Table:
        vals, _ = binary_to_sets(t[set_col])
        u, c = np.unique(vals, return_counts=True)
        part = (u % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"tok": pa.array(u.view(np.int64), pa.int64()),
                         "df": pa.array(c.astype(np.int64), pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _sum(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({"tok": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        toks = np.asarray(tab["tok"], dtype=np.int64)
        dfs = np.asarray(tab["df"], dtype=np.int64)
        u, inv = np.unique(toks, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.int64)
        np.add.at(sums, inv, dfs)
        keep = sums >= 2
        return pa.table({"tok": pa.array(u[keep], pa.int64()),
                         "df": pa.array(sums[keep], pa.int64())})

    merged = hash_partition_map(sets_ds, "part", _sum, n_parts,
                                map_fn=_partial,
                                map_chunk_rows=cfg.batch_size).materialize()
    if merged.count() > df_broadcast_max:
        return None
    tabs = [t for t in ray.get(list(merged.to_arrow_refs())) if len(t)]
    if not tabs:
        return ray.put((np.empty(0, np.uint64), np.empty(0, np.int64)))
    tab = pa.concat_tables(tabs)
    toks = np.asarray(tab["tok"], dtype=np.int64).view(np.uint64)
    dfs = np.asarray(tab["df"], dtype=np.int64)
    order = np.argsort(toks)
    return ray.put((np.ascontiguousarray(toks[order]),
                    np.ascontiguousarray(dfs[order])))


def allpairs_jaccard(docs_ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                     threshold: float | None = ...,
                     id_col: str = "doc_id", text_col: str = "text",
                     sets_ds=None, set_col: str = "tokens",
                     order: str = "df", df_broadcast_max: int = 8_000_000,
                     max_bucket: int = 20_000, counters=None):
    """Complete ``(a, b, intersection, union, jaccard)`` table of ALL
    document pairs with exact Jaccard >= threshold over word-token sets
    (or over any prepared ``sets_ds`` with a binary ``set_col`` — e.g.
    the signature stage's shingle sets, for LSH-agreement checks).

    ``order``: "df" (default) orders each doc's tokens rarest-first so
    prefixes land in small buckets; "hash" skips the df pass (one fewer
    exchange, weaker selectivity).  Both are exact.
    """
    if sets_ds is None:
        sets_ds = doc_token_sets(docs_ds, cfg, id_col=id_col,
                                 text_col=text_col)
    return _allpairs_core(sets_ds, cfg, threshold, id_col, set_col,
                          order, df_broadcast_max, max_bucket,
                          cross_parity=False, counters=counters)


def _allpairs_core(sets_ds, cfg: PipelineConfig, threshold,
                   id_col: str, set_col: str, order: str,
                   df_broadcast_max: int, max_bucket: int, *,
                   cross_parity: bool, counters=None):
    """Shared physical plan of the self-join (`allpairs_jaccard`) and the
    R-S cross-corpus join (`crosspairs_jaccard`).  With
    ``cross_parity=True`` the ids are assumed side-tagged in their low
    bit (even = left corpus, odd = right) and only cross-side pairs
    survive the emission stage — the prefix-filter theorem is unchanged
    (it bounds where a qualifying pair's shared tokens can sit,
    regardless of which corpus each side came from)."""
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map
    from .verify import verify_pairs

    thr = cfg.verify_threshold if threshold is ... else threshold
    if not (0.0 < thr <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {thr}")
    n_parts = cfg.resolved_partitions()

    sets_ds = sets_ds.materialize()     # read twice: prefixes + verify

    df_ref = None
    if order == "df":
        df_ref = _df_broadcast(sets_ds, cfg, set_col, df_broadcast_max)
        if df_ref is None:
            warnings.warn(
                f"allpairs_jaccard: df map exceeds {df_broadcast_max} "
                "entries; falling back to order='hash' (still exact, "
                "less selective prefixes)", RuntimeWarning)
    elif order != "hash":
        raise ValueError(f"unknown order {order!r}")

    def _prefix(t: pa.Table) -> pa.Table:
        vals, offs = binary_to_sets(t[set_col])
        ids = np.asarray(t[id_col], dtype=np.int64)
        n = offs[1:] - offs[:-1]
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n)
        if df_ref is not None:
            from ..functions.broadcast import bcast_get
            toks, dfs = bcast_get(df_ref)
            if len(toks):
                pos = np.clip(np.searchsorted(toks, vals), 0,
                              len(toks) - 1)
                df = np.where(toks[pos] == vals, dfs[pos], 1)
            else:
                df = np.ones(len(vals), dtype=np.int64)
            order_ix = np.lexsort((vals, df, doc_idx))
        else:
            df = None
            order_ix = np.arange(len(vals))   # sets are token-ascending
        alpha = np.ceil(thr * n).astype(np.int64)
        p = np.clip(n - alpha + 1, 0, n)
        keep = _intra(n) < np.repeat(p, n)
        if df is not None:
            keep &= df[order_ix] >= 2         # df=1 cannot be shared
        tok = vals[order_ix][keep]
        did = np.repeat(ids, n)[order_ix][keep]
        part = (tok % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"tok": pa.array(tok.view(np.int64), pa.int64()),
                         id_col: pa.array(did, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _emit(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            lo = hi = np.empty(0, np.int64)
        else:
            keys = np.asarray(group["tok"], dtype=np.int64)
            ids = np.asarray(group[id_col], dtype=np.int64)
            ord_ix = np.lexsort((ids, keys))
            keys, ids = keys[ord_ix], ids[ord_ix]
            starts = np.empty(len(keys), dtype=bool)
            starts[0] = True
            starts[1:] = keys[1:] != keys[:-1]
            run_len = np.diff(np.append(np.flatnonzero(starts), len(keys)))
            worst = int(run_len.max()) if len(run_len) else 0
            if worst > max_bucket:
                raise RuntimeError(
                    f"allpairs_jaccard: a prefix-token bucket has {worst} "
                    f"members (> max_bucket={max_bucket}); its exact "
                    "output is quadratic — this corpus slice is a "
                    "duplicate flood.  Use the LSH tier "
                    "(near_dup_pairs/near_dup_clusters), whose salted "
                    "overlap chains represent such floods in linear "
                    "space, or raise max_bucket knowingly.")
            lo, hi = _all_pairs_of_runs(keys, ids)
            if cross_parity and len(lo):
                cross = ((lo ^ hi) & 1) == 1
                lo, hi = lo[cross], hi[cross]
            emitted_n = len(lo)
            if len(lo):
                pk = np.unique(np.stack([lo, hi], axis=1), axis=0)
                lo, hi = pk[:, 0].copy(), pk[:, 1].copy()
            if counters is not None:
                counters.add.remote({
                    "allpairs_bucket_pairs_emitted": int(emitted_n),
                    "allpairs_candidates_local": int(len(lo))})
        part = (splitmix64(lo.view(np.uint64)
                           * np.uint64(0x9E3779B97F4A7C15)
                           ^ hi.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"a": pa.array(lo, pa.int64()),
                         "b": pa.array(hi, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def _dedup(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        pk = np.unique(np.stack([np.asarray(group["a"], dtype=np.int64),
                                 np.asarray(group["b"], dtype=np.int64)],
                                axis=1), axis=0)
        if counters is not None:
            counters.add.remote({"allpairs_candidates": int(len(pk))})
        return pa.table({"a": pa.array(pk[:, 0], pa.int64()),
                         "b": pa.array(pk[:, 1], pa.int64())})

    emitted = hash_partition_map(sets_ds, "part", _emit, n_parts,
                                 map_fn=_prefix,
                                 map_chunk_rows=cfg.batch_size)
    pairs = hash_partition_map(emitted, "part", _dedup, n_parts)
    return verify_pairs(pairs, sets_ds, cfg, threshold=thr,
                        id_col=id_col, set_col=set_col)


_SIDE_ID_MAX = (1 << 62) - 1   # |id| bound so 2*id (+1) stays in int64


def tag_side(ds, side_bit: int, id_col: str, op_name: str):
    """Tag a dataset's ids with a side in the low bit (left = 2*id,
    right = 2*id+1) for the R-S join family — shared by
    `crosspairs_jaccard` and textstats.winnow_crosspairs so the
    overflow guard and encoding cannot diverge.  The guard compares
    both signs explicitly: ``np.abs(int64.min)`` wraps negative, so an
    abs()-based check would silently pass the one id that overflows."""
    def _m(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) and (int(ids.max()) > _SIDE_ID_MAX
                         or int(ids.min()) < -_SIDE_ID_MAX):
            raise ValueError(
                f"{op_name}: |{id_col}| exceeds 2^62-1; "
                "the parity side-tag would overflow int64")
        return t.set_column(t.schema.get_field_index(id_col), id_col,
                            pa.array(ids * 2 + side_bit, pa.int64()))
    return ds.map_batches(_m, batch_format="pyarrow",
                          zero_copy_batch=True)


def decode_sides(a: np.ndarray, b: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of `tag_side` for an unordered cross pair: returns
    (left original id, right original id).  Arithmetic shift
    floor-divides, so negative ids round-trip exactly."""
    left = np.where((a & 1) == 0, a, b) >> 1
    right = np.where((a & 1) == 1, a, b) >> 1
    return left, right


def crosspairs_jaccard(left_ds, right_ds,
                       cfg: PipelineConfig = DEFAULT_CONFIG, *,
                       threshold: float | None = ...,
                       id_col: str = "doc_id", text_col: str = "text",
                       order: str = "df", df_broadcast_max: int = 8_000_000,
                       max_bucket: int = 20_000, counters=None):
    """EXACT R-S similarity join: every ``(a, b, intersection, union,
    jaccard)`` pair with word-token Jaccard >= threshold where ``a``
    comes from ``left_ds`` and ``b`` from ``right_ds`` — the
    cross-corpus counterpart of `allpairs_jaccard` (dedup a new crawl
    against an existing corpus, align two snapshots without a shared
    url key, audit benchmark contamination by content rather than
    n-gram membership).  The two id spaces may overlap: sides are
    tagged in the id's low bit (left = 2*id, right = 2*id+1), the
    shared prefix-filter plan runs over the union, only cross-parity
    pairs survive emission, and the output carries the ORIGINAL ids.

    The prefix-filter recall theorem (module docstring) is oblivious to
    sides, so cross recall is exactly 1.0; within-side collisions are
    emitted by the bucket scan and dropped by a vectorized parity mask
    before the dedup exchange.
    """
    left_sets = doc_token_sets(left_ds, cfg, id_col=id_col,
                               text_col=text_col)
    right_sets = doc_token_sets(right_ds, cfg, id_col=id_col,
                                text_col=text_col)
    union = tag_side(left_sets, 0, id_col, "crosspairs_jaccard").union(
        tag_side(right_sets, 1, id_col, "crosspairs_jaccard"))
    scored = _allpairs_core(union, cfg, threshold, id_col, "tokens",
                            order, df_broadcast_max, max_bucket,
                            cross_parity=True, counters=counters)

    def _decode(t: pa.Table) -> pa.Table:
        left, right = decode_sides(np.asarray(t["a"], dtype=np.int64),
                                   np.asarray(t["b"], dtype=np.int64))
        return pa.table({"a": pa.array(left, pa.int64()),
                         "b": pa.array(right, pa.int64()),
                         "intersection": t["intersection"],
                         "union": t["union"],
                         "jaccard": t["jaccard"]})

    return scored.map_batches(_decode, batch_format="pyarrow",
                              zero_copy_batch=True)
