"""LSH banding → candidate pairs, with explicit skew handling.

Wide steps and their shuffle keys (SURVEY.md §4.2):
  1. band explosion  — narrow map (no shuffle): one (band_key, doc_id)
     row per non-empty doc per band.
  2. bucket sizing   — ``groupby(band_key).count()``: shuffle on band_key
     over the *small* (key, count) partials.
  3. bucket filter   — singleton buckets (the vast majority) never reach
     the pair join; over-cap buckets (boilerplate collapse — the skew
     case the reference never faces, SURVEY.md §7) are SALT-SPLIT into
     overlapping sub-buckets instead of B²-exploding: pair emission
     stays linear in the bucket size while overlap chaining keeps every
     genuine flood cluster connected (the verify + CC stages downstream
     recover the cluster).  Salted bucket/row/pair counts are reported
     through the ``counters`` actor (the reference always prints its
     sanity metric, jaccard.cpp:811-819 — nothing is dropped silently).
  4. pair emission   — self-join on band_key restricted to surviving
     buckets, then canonicalize a<b; fully vectorized, no per-group
     Python.
  5. pair dedup      — ``groupby(a, b)`` exact dedup (shuffle on the
     canonical pair key).

Empty-shingle docs are excluded from banding (their sentinel signatures
would otherwise all collide into one giant bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.broadcast import bcast_get
from ..functions.shuffle import hash_partition_map


def explode_bands(sig_ds, cfg: PipelineConfig, id_col: str = "doc_id"):
    """signatures → one (band_key, doc_id) row per band per non-empty doc."""

    def _explode(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["n_shingles"], 0)
        batch = batch.filter(keep)
        n = len(batch)
        if n == 0:
            return pa.table({
                "band_key": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
            })
        bands = batch["bands"].combine_chunks()
        bw = len(bands[0])
        # int64 bit-view: Ray groupby keys must stay native Arrow ints
        # (uint64 ≥ 2^63 degrades to pickled-object columns)
        flat = np.asarray(bands.flatten(), dtype=np.uint64).view(np.int64)
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64), bw)
        return pa.table({
            "band_key": pa.array(flat, type=pa.int64()),
            id_col: pa.array(ids, type=pa.int64()),
        })

    return sig_ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)


# Over-cap buckets are split into overlapping sub-buckets of this size
# (consecutive sub-buckets share one member, so verified flood clusters
# stay connected through CC).  Pair emission per over-cap bucket of size
# L is then ~L * chunk/2 — linear in L, never L².  The chunk ADAPTS to
# the bucket: it shrinks as L grows (pair budget per bucket ≈ cap²/2,
# the most an at-cap bucket can emit) down to SALT_CHUNK_MIN, so a
# boilerplate flood that collapses 30% of a corpus into one band bucket
# (SURVEY §"What's hard" #1) costs ~4L pairs, not 64L — each member
# still meets ≥SALT_CHUNK_MIN-1 chunk peers.  The chunk member order is
# band-INDEPENDENT (a hash of the id alone — see _emit_run_pairs), so
# identical buckets in different bands emit identical chains and the
# global candidate dedup collapses them before verify; connectivity
# rests on the within-chunk overlap chaining (each member meets
# chunk−1 peers, consecutive chunks share one member), not on
# cross-band chain diversity.  Deterministic: chunk depends only on
# (L, cap).
SALT_CHUNK = 128
SALT_CHUNK_MIN = 8


def _overcap_chunk(run_len: int, cap: int) -> int:
    budget = max(cap * cap // 2, SALT_CHUNK * SALT_CHUNK)
    return int(max(SALT_CHUNK_MIN,
                   min(min(cap, SALT_CHUNK), 2 * budget // max(run_len, 1))))


def _all_pairs_of_runs(keys: np.ndarray, ids: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Every canonical (a<b) pair within each key-run of the KEY-SORTED
    (keys, ids) arrays, via numpy repeat/arange arithmetic — no Python
    loop over buckets or pairs."""
    starts = np.empty(len(keys), dtype=bool)
    starts[0] = True
    starts[1:] = keys[1:] != keys[:-1]
    rs = np.flatnonzero(starts)
    rl = np.diff(np.append(rs, len(keys)))
    keep = rl >= 2
    rs, rl = rs[keep], rl[keep]
    if len(rs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # element-level: for each run, element at local position p starts
    # (len-1-p) pairs with the elements after it
    el_idx = np.repeat(rs, rl) + _intra(rl)
    el_rep = np.repeat(rs + rl - 1, rl) - el_idx        # pairs started here
    a_idx = np.repeat(el_idx, el_rep)
    b_idx = a_idx + 1 + _intra(el_rep)
    a, b = ids[a_idx], ids[b_idx]
    return np.minimum(a, b), np.maximum(a, b)


def _emit_run_pairs(keys: np.ndarray, ids: np.ndarray, cap: int
                    ) -> tuple[np.ndarray, np.ndarray, dict]:
    """Vectorized within-bucket pair emission over (key, id) rows that
    contain COMPLETE buckets.

    Runs of ≤ cap rows emit all canonical (a<b) pairs.  Over-cap runs
    are salt-split: members are ordered by a deterministic hash of
    (id, band_key) and chunked into overlapping SALT_CHUNK-sized
    sub-buckets (consecutive chunks share one member), each emitting its
    within-chunk pairs — bounded linear emission with cluster
    connectivity preserved via the overlap chain.  Deterministic for a
    given (key, ids) multiset regardless of partitioning.

    Returns (lo, hi, stats) where stats counts salted buckets/rows/pairs.
    """
    stats = {"lsh_overcap_buckets": 0, "lsh_overcap_rows": 0,
             "lsh_salted_pairs": 0}
    if len(keys) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), stats
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    starts = np.empty(len(keys), dtype=bool)
    starts[0] = True
    starts[1:] = keys[1:] != keys[:-1]
    run_start = np.flatnonzero(starts)
    run_len = np.diff(np.append(run_start, len(keys)))

    over = run_len > cap
    small = ~over
    # fast path: all-pairs within the ≤cap runs
    if small.any():
        sel = np.repeat(small, run_len)
        lo, hi = _all_pairs_of_runs(keys[sel], ids[sel])
    else:
        lo = hi = np.empty(0, np.int64)

    if over.any():
        from ..functions.hashing import splitmix64
        stats["lsh_overcap_buckets"] = int(over.sum())
        stats["lsh_overcap_rows"] = int(run_len[over].sum())
        sub_keys, sub_ids = [], []
        serial = 0
        for s, l in zip(run_start[over], run_len[over]):
            chunk = _overcap_chunk(int(l), cap)
            step = chunk - 1
            rid = ids[s:s + l]
            # pseudo-random member order, deterministic AND band-key
            # independent: a flood that collapses into every band's
            # bucket makes all 32 bands emit (near-)identical chains, so
            # the global candidate dedup collapses them before verify —
            # measured 32x fewer verified pairs on a 30%-flood corpus.
            # (Per-bucket band salts gave redundant cross-band chains;
            # that redundancy was incidental — within-chunk overlap
            # already chains the cluster per band.)
            rid = rid[np.argsort(
                splitmix64(rid.view(np.uint64)
                           ^ np.uint64(0x9E3779B97F4A7C15)),
                kind="stable")]
            n_chunks = max(1, -(-(l - 1) // step))       # ceil((l-1)/step)
            # vectorized chunk expansion: a mega-bucket yields tens of
            # thousands of chunks — a per-chunk Python loop here was
            # ~1000 s at 300k members (measured); this is O(l) numpy
            pos = (np.arange(n_chunks, dtype=np.int64)[:, None] * step
                   + np.arange(chunk, dtype=np.int64)[None, :]).ravel()
            keep = pos < l
            sub_ids.append(rid[pos[keep]])
            sub_keys.append(serial + np.repeat(
                np.arange(n_chunks, dtype=np.int64), chunk)[keep])
            serial += n_chunks
        sk = np.concatenate(sub_keys)
        si = np.concatenate(sub_ids)
        slo, shi = _all_pairs_of_runs(sk, si)
        stats["lsh_salted_pairs"] = len(slo)
        lo = np.concatenate([lo, slo])
        hi = np.concatenate([hi, shi])
    return lo, hi, stats


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(offs, lens)


def candidate_pairs(band_ds, cfg: PipelineConfig, id_col: str = "doc_id",
                    counters=None, dedup: str = "global"):
    """(band_key, doc_id) rows → distinct canonical candidate pairs (a < b).

    Physical plan: two LOW-CARDINALITY partition shuffles, no joins and
    no per-bucket aggregates (millions of tiny groups pay per-group
    overhead in both Ray's groupby-count and hash joins):

      1. partition by ``hash(band_key) % P`` → every bucket lands whole
         in one partition → one vectorized sort-and-emit per partition
         produces its pairs, with EXACT over-cap bucket salting (the
         skew guard, see ``_emit_run_pairs``) computed locally for free.
      2. partition by ``hash(a,b) % P`` → per-partition np.unique gives
         the globally distinct pair set (a pair collides in ≤ bands
         buckets, all mapping to the same hash partition).

    ``counters``: optional ``RunCounters.actor`` handle; salting stats
    (`lsh_overcap_buckets/rows`, `lsh_salted_pairs`) are accumulated
    there fire-and-forget from the emit tasks.

    ``dedup``: "global" (default) runs shuffle 2 and returns globally
    distinct pairs.  "local" skips it — the output may contain the same
    pair from different band partitions (already deduped within each) —
    for consumers that shuffle by hash(a) anyway (the verification
    exchange) and can dedup there for free, saving a whole barrier.

    Returns a Dataset with columns ``a:int64, b:int64``.
    """
    from ..functions.hashing import splitmix64

    n_parts = cfg.resolved_partitions()
    cap = cfg.band_bucket_cap

    def _part1(t: pa.Table) -> pa.Table:
        k = np.asarray(t["band_key"], dtype=np.int64)
        part = (k.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "band_key": pa.array(k, pa.int64()),
            id_col: t[id_col],
            "part": pa.array(part, pa.int64()),
        })

    parted = band_ds.map_batches(_part1, batch_format="pyarrow",
                                 zero_copy_batch=True)

    local_only = dedup == "local"

    def _emit(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            lo = hi = np.empty(0, np.int64)
        else:
            keys = np.asarray(group["band_key"], dtype=np.int64)
            ids = np.asarray(group[id_col], dtype=np.int64)
            lo, hi, stats = _emit_run_pairs(keys, ids, cap)
            if counters is not None and any(stats.values()):
                # fire-and-forget: the in-flight-add race with a driver
                # read is absorbed by RunCounters.get()'s settle loop
                counters.add.remote(stats)
        # local pre-dedup: identical pairs from different buckets of the
        # same partition collapse here before the shuffle
        if len(lo):
            pk = np.stack([lo, hi], axis=1)
            pk = np.unique(pk, axis=0)
            lo, hi = pk[:, 0].copy(), pk[:, 1].copy()
        cols = {
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
        }
        if not local_only:
            part = (splitmix64(lo.view(np.uint64)
                               * np.uint64(0x9E3779B97F4A7C15)
                               ^ hi.view(np.uint64))
                    % np.uint64(n_parts)).astype(np.int64)
            cols["part"] = pa.array(part, pa.int64())
        return pa.table(cols)

    pairs = hash_partition_map(parted, "part", _emit, n_parts)
    if local_only:
        return pairs

    def _dedup(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        pk = np.stack([np.asarray(group["a"], dtype=np.int64),
                       np.asarray(group["b"], dtype=np.int64)], axis=1)
        pk = np.unique(pk, axis=0)
        return pa.table({"a": pa.array(pk[:, 0], pa.int64()),
                         "b": pa.array(pk[:, 1], pa.int64())})

    return hash_partition_map(pairs, "part", _dedup, n_parts)


def _debug_dump(tab: pa.Table, dirpath: str) -> None:
    """Worker-side intermediate dump for ``debug_dir`` mode — one
    parquet file per task invocation (unique name, append-safe)."""
    import os
    import uuid

    import pyarrow.parquet as pq
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(tab, os.path.join(dirpath,
                                     f"part-{uuid.uuid4().hex}.parquet"))


def candidate_pairs_from_docs(docs, cfg: PipelineConfig, *,
                              id_col: str = "doc_id",
                              text_col: str = "text", counters=None,
                              dedup: str = "global", debug_dir: str | None = None):
    """docs → candidate pairs with the ENTIRE map side (fused stream-OPH
    signatures → band explosion → partition tag) executed inside the
    shuffle's split tasks: the 32x-exploded band rows are sliced into
    partitions in the same task that produced them, never materialized to
    the object store as an intermediate dataset.  One barrier less and
    ~2x less plasma traffic than signatures()+explode_bands()+
    candidate_pairs() — the scaling-efficiency path for the flagship
    pipeline.

    ``debug_dir``: when set, every fused intermediate that normally
    never touches storage is dumped as parquet — band rows to
    ``{debug_dir}/bands/``, per-bucket candidate pairs to
    ``{debug_dir}/candidates/`` — the analogue of the reference's
    DEBUG_2 intermediate-vector dumps (jaccard.cpp:823-867), so a wrong
    answer on the fused path is localizable stage by stage."""
    from ..stages.signatures import SignatureStage

    n_parts = cfg.resolved_partitions()
    stage_cache: dict = {}

    def _map(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return pa.table({
                "band_key": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            })
        stage = stage_cache.get("s")
        if stage is None:
            stage = SignatureStage(cfg, id_col=id_col, text_col=text_col,
                                   keep_shingles=False, keep_minhash=False,
                                   with_simhash=False)
            stage_cache["s"] = stage
        sig = stage(t)
        keep = pc.greater(sig["n_shingles"], 0)
        sig = sig.filter(keep)
        if len(sig) == 0:
            return pa.table({
                "band_key": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            })
        bands = sig["bands"].combine_chunks()
        bw = len(bands[0])
        flat = np.asarray(bands.flatten(), dtype=np.uint64).view(np.int64)
        ids = np.repeat(np.asarray(sig[id_col], dtype=np.int64), bw)
        part = (flat.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        out = pa.table({
            "band_key": pa.array(flat, pa.int64()),
            id_col: pa.array(ids, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })
        if debug_dir is not None:
            _debug_dump(out, f"{debug_dir}/bands")
        return out

    cap = cfg.band_bucket_cap
    local_only = dedup == "local"

    def _emit(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            lo = hi = np.empty(0, np.int64)
        else:
            keys = np.asarray(group["band_key"], dtype=np.int64)
            ids = np.asarray(group[id_col], dtype=np.int64)
            lo, hi, stats = _emit_run_pairs(keys, ids, cap)
            if counters is not None and any(stats.values()):
                counters.add.remote(stats)   # settle on read, not here
        if len(lo):
            pk = np.stack([lo, hi], axis=1)
            pk = np.unique(pk, axis=0)
            lo, hi = pk[:, 0].copy(), pk[:, 1].copy()
        cols = {"a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64())}
        if not local_only:
            from ..functions.hashing import splitmix64
            part = (splitmix64(lo.view(np.uint64)
                               * np.uint64(0x9E3779B97F4A7C15)
                               ^ hi.view(np.uint64))
                    % np.uint64(n_parts)).astype(np.int64)
            cols["part"] = pa.array(part, pa.int64())
        out = pa.table(cols)
        if debug_dir is not None:
            _debug_dump(out, f"{debug_dir}/candidates")
        return out

    pairs = hash_partition_map(docs.select_columns([id_col, text_col]),
                               "part", _emit, n_parts, map_fn=_map,
                               map_chunk_rows=cfg.batch_size)
    if local_only:
        return pairs

    def _dedup(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        pk = np.stack([np.asarray(group["a"], dtype=np.int64),
                       np.asarray(group["b"], dtype=np.int64)], axis=1)
        pk = np.unique(pk, axis=0)
        return pa.table({"a": pa.array(pk[:, 0], pa.int64()),
                         "b": pa.array(pk[:, 1], pa.int64())})

    return hash_partition_map(pairs, "part", _dedup, n_parts)


def incremental_candidate_pairs(inc_docs, corpus_docs, cfg: PipelineConfig, *,
                                corpus_bands=None, corpus_band_bloom=None,
                                id_col: str = "doc_id",
                                text_col: str = "text", counters=None):
    """LSH candidates for an increment arriving NEXT TO an existing
    corpus: every emitted pair touches at least one increment doc —
    corpus-internal pairs (the work a previous dedup run already did)
    are never generated.

    Scale design: both sides are banded into (band_key, id, src) rows
    and exchanged once by band key; inside each partition, buckets
    containing NO increment member are dropped BEFORE pair emission
    (at production scale almost every bucket is corpus-only, so the
    emission cost is proportional to the increment's bucket footprint,
    not the corpus's).  Within surviving buckets the standard capped /
    salted emission runs, then corpus–corpus pairs are filtered by an
    id→src lookup.

    ``corpus_bands``: optional prebuilt band table (columns ``band_key``,
    id_col — e.g. a persisted ``explode_bands(signatures(corpus))``)
    so the daily run never re-hashes corpus text; without it the corpus
    is banded in-stream like the increment.

    ``corpus_band_bloom``: optional persisted band-key Bloom store
    (``incremental.build_band_bloom`` over ``corpus_bands``; requires
    ``corpus_bands``).  The increment is banded first and its DISTINCT
    band keys are probed against the filter; corpus band rows whose key
    misses the surviving-key broadcast are dropped BEFORE the exchange.
    Output is IDENTICAL — a corpus row pruned here sat in a bucket with
    no increment member, which the in-exchange bucket drop would have
    discarded anyway (Bloom false positives only let through keys the
    corpus filter then finds no rows for); what changes is that the
    corpus-side exchange volume falls from |corpus band store| to the
    increment's bucket footprint + the FP tail.  Driver/broadcast
    state: the increment's distinct band keys (bands·|increment| × 8 B
    worst case) — increment-scale, the same bound the exact tier's
    candidate set carries.

    Output columns: ``a`` int64, ``b`` int64, ``cross`` int8 — cross=1
    pairs are oriented a=increment doc, b=corpus doc; cross=0 pairs are
    both-increment with a<b.  Globally distinct."""
    import ray

    from ..functions.hashing import splitmix64
    from ..stages.signatures import SignatureStage, signatures

    n_parts = cfg.resolved_partitions()
    cap = cfg.band_bucket_cap
    stage_cache: dict = {}

    def _with_src(val):
        def _f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "src", pa.array(np.full(len(t), val, np.int8), pa.int8()))
        return _f

    if corpus_band_bloom is not None:
        if corpus_bands is None:
            raise ValueError("corpus_band_bloom requires corpus_bands "
                             "(the filter only prunes the persisted "
                             "band store)")
        from ..stages.incremental import load_band_bloom, probe_band_bloom

        # band the increment ONCE (the same signatures→explode_bands
        # path that built the corpus store, so keys are identical) and
        # keep the materialized increment-scale table for the exchange
        inc_bands = explode_bands(
            signatures(inc_docs, cfg, id_col=id_col, text_col=text_col,
                       keep_shingles=False, keep_minhash=False,
                       with_simhash=False),
            cfg, id_col=id_col).materialize()

        key_tabs = [t for t in ray.get(inc_bands.map_batches(
            lambda t: pa.table({"band_key": pa.array(
                np.unique(np.asarray(t["band_key"], dtype=np.int64)),
                pa.int64())}),
            batch_format="pyarrow").to_arrow_refs()) if len(t)]
        inc_keys = (np.unique(np.concatenate(
            [np.asarray(t["band_key"], dtype=np.int64)
             for t in key_tabs])) if key_tabs else np.empty(0, np.int64))
        blooms, store_np = load_band_bloom(corpus_band_bloom)
        hit_keys = inc_keys[probe_band_bloom(inc_keys, blooms, store_np)] \
            if store_np else inc_keys
        if counters is not None:
            counters.add.remote({
                "band_bloom_inc_keys": int(len(inc_keys)),
                "band_bloom_hit_keys": int(len(hit_keys))})
        hit_ref = ray.put(hit_keys)        # sorted (np.unique order)

        def _corp_filter(t: pa.Table) -> pa.Table:
            hk = bcast_get(hit_ref)
            bk = np.asarray(t["band_key"], dtype=np.int64)
            if not len(hk) or not len(bk):
                keep = np.zeros(len(bk), dtype=bool)
            else:
                pos = np.clip(np.searchsorted(hk, bk), 0, len(hk) - 1)
                keep = hk[pos] == bk
            if counters is not None and len(bk):
                counters.add.remote({
                    "band_bloom_corpus_rows_seen": int(len(bk)),
                    "band_bloom_corpus_rows_shipped": int(keep.sum())})
            return t.filter(pa.array(keep))

        inc_in = inc_bands.map_batches(_with_src(1),
                                       batch_format="pyarrow")
        corp_in = corpus_bands.select_columns(["band_key", id_col]) \
            .map_batches(_corp_filter, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .map_batches(_with_src(0), batch_format="pyarrow")
        both = inc_in.union(corp_in)
    else:
        inc_in = inc_docs.select_columns([id_col, text_col]).map_batches(
            _with_src(1), batch_format="pyarrow")
        if corpus_bands is not None:
            corp_in = corpus_bands.select_columns(["band_key", id_col]) \
                .map_batches(_with_src(0), batch_format="pyarrow")
        else:
            corp_in = corpus_docs.select_columns([id_col, text_col]) \
                .map_batches(_with_src(0), batch_format="pyarrow")
        both = inc_in.union(corp_in)

    _EMPTY_BANDS = pa.table({
        "band_key": pa.array([], pa.int64()),
        id_col: pa.array([], pa.int64()),
        "src": pa.array([], pa.int8()),
        "part": pa.array([], pa.int64()),
    })

    def _map(t: pa.Table) -> pa.Table:
        # chunks arrive in one of two shapes: prebuilt band rows
        # (band_key, id, src) pass through with a partition tag; text
        # rows (id, text, src) run the fused stream-OPH banding
        if len(t) == 0 or id_col not in t.column_names:
            return _EMPTY_BANDS
        if "band_key" in t.column_names:
            k = np.asarray(t["band_key"], dtype=np.int64)
            part = (k.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
            return pa.table({
                "band_key": t["band_key"], id_col: t[id_col],
                "src": t["src"], "part": pa.array(part, pa.int64()),
            })
        stage = stage_cache.get("s")
        if stage is None:
            stage = SignatureStage(cfg, id_col=id_col, text_col=text_col,
                                   keep_shingles=False, keep_minhash=False,
                                   with_simhash=False)
            stage_cache["s"] = stage
        sig = stage(t)
        keep = pc.greater(sig["n_shingles"], 0)
        src = np.asarray(t["src"], dtype=np.int8)[
            np.asarray(keep, dtype=bool)]
        sig = sig.filter(keep)
        if len(sig) == 0:
            return _EMPTY_BANDS
        bands = sig["bands"].combine_chunks()
        bw = len(bands[0])
        flat = np.asarray(bands.flatten(), dtype=np.uint64).view(np.int64)
        ids = np.repeat(np.asarray(sig[id_col], dtype=np.int64), bw)
        part = (flat.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "band_key": pa.array(flat, pa.int64()),
            id_col: pa.array(ids, pa.int64()),
            "src": pa.array(np.repeat(src, bw), pa.int8()),
            "part": pa.array(part, pa.int64()),
        })

    _EMPTY_PAIRS = {"a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cross": pa.array([], pa.int8())}

    def _emit(group: pa.Table | None) -> pa.Table:
        lo = hi = np.empty(0, np.int64)
        cross = np.empty(0, np.int8)
        if group is not None and len(group):
            keys = np.asarray(group["band_key"], dtype=np.int64)
            ids = np.asarray(group[id_col], dtype=np.int64)
            srcs = np.asarray(group["src"], dtype=np.int8)
            order = np.lexsort((ids, keys))
            keys, ids, srcs = keys[order], ids[order], srcs[order]
            starts = np.empty(len(keys), dtype=bool)
            starts[0] = True
            starts[1:] = keys[1:] != keys[:-1]
            run_start = np.flatnonzero(starts)
            run_len = np.diff(np.append(run_start, len(keys)))
            # drop corpus-only buckets BEFORE emission — the whole point
            has_inc = np.maximum.reduceat(srcs, run_start) > 0
            sel = np.repeat(has_inc, run_len)
            keys, ids, srcs = keys[sel], ids[sel], srcs[sel]
            lo, hi, stats = _emit_run_pairs(keys, ids, cap)
            if counters is not None and any(stats.values()):
                counters.add.remote(stats)   # settle on read, not here
            if len(lo):
                uid, uidx = np.unique(ids, return_index=True)
                usrc = srcs[uidx]
                slo = usrc[np.searchsorted(uid, lo)]
                shi = usrc[np.searchsorted(uid, hi)]
                keep = (slo.astype(np.int16) + shi) > 0
                lo, hi, slo, shi = lo[keep], hi[keep], slo[keep], shi[keep]
                cross = (slo != shi).astype(np.int8)
                # orient cross pairs a=increment, b=corpus (downstream
                # classification reads membership straight off the column)
                swap = (cross == 1) & (slo == 0)
                lo, hi = (np.where(swap, hi, lo).astype(np.int64),
                          np.where(swap, lo, hi).astype(np.int64))
                pk = np.stack([lo, hi], axis=1)
                _, uniq = np.unique(pk, axis=0, return_index=True)
                lo, hi, cross = lo[uniq], hi[uniq], cross[uniq]
        part = (splitmix64(lo.view(np.uint64)
                           * np.uint64(0x9E3779B97F4A7C15)
                           ^ hi.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"a": pa.array(lo, pa.int64()),
                         "b": pa.array(hi, pa.int64()),
                         "cross": pa.array(cross, pa.int8()),
                         "part": pa.array(part, pa.int64())})

    pairs = hash_partition_map(both, "part", _emit, n_parts, map_fn=_map,
                               map_chunk_rows=cfg.batch_size)

    def _dedup(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0 or "a" not in group.column_names:
            return pa.table(_EMPTY_PAIRS)
        a = np.asarray(group["a"], dtype=np.int64)
        b = np.asarray(group["b"], dtype=np.int64)
        c = np.asarray(group["cross"], dtype=np.int8)
        pk = np.stack([a, b], axis=1)
        _, uniq = np.unique(pk, axis=0, return_index=True)
        return pa.table({"a": pa.array(a[uniq], pa.int64()),
                         "b": pa.array(b[uniq], pa.int64()),
                         "cross": pa.array(c[uniq], pa.int8())})

    return hash_partition_map(pairs, "part", _dedup, n_parts)


def simhash_candidate_pairs(sig_ds, cfg: PipelineConfig, id_col: str = "doc_id"):
    """SimHash blocking: docs whose simhash agrees on any of 4 16-bit
    blocks become candidates (covers all pairs within Hamming distance 3
    by pigeonhole).  Same bucket → pair machinery as MinHash-LSH."""

    def _explode(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["n_shingles"], 0))
        sh = np.asarray(batch["simhash"], dtype=np.uint64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keys, out_ids = [], []
        for blk in range(4):
            part = (sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            # mix block index into the key so blocks don't collide
            keys.append((part | (np.uint64(blk) << np.uint64(48))).view(np.int64))
            out_ids.append(ids)
        return pa.table({
            "band_key": pa.array(
                np.concatenate(keys) if keys else np.empty(0, np.int64),
                type=pa.int64()),
            id_col: pa.array(
                np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
                type=pa.int64()),
        })

    band_ds = sig_ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
    return candidate_pairs(band_ds, cfg, id_col=id_col)
