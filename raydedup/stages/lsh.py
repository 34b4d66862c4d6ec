"""LSH banding → candidate pairs, with explicit skew handling.

Wide steps and their shuffle keys (SURVEY.md §4.2):
  1. band explosion  — narrow map (no shuffle): one (band_key, doc_id)
     row per non-empty doc per band.
  2. bucket sizing   — ``groupby(band_key).count()``: shuffle on band_key
     over the *small* (key, count) partials.
  3. bucket filter   — keep 2 ≤ n ≤ cap: singleton buckets (the vast
     majority) never reach the pair join; over-cap buckets (boilerplate
     collapse — the skew case the reference never faces, SURVEY.md §7)
     are dropped and counted, not allowed to B² -explode.
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


HOT_DETECT_EXACT_MAX_ROWS = 4_000_000   # exact driver merge below this
HOT_DETECT_SAMPLE_TARGET = 2_000_000    # sampled rows above it


def _merge_partial_counts(parts) -> tuple[np.ndarray, np.ndarray]:
    keys = np.concatenate([np.asarray(t["band_key"]) for t in parts])
    cnts = np.concatenate([np.asarray(t["n"]) for t in parts])
    order = np.argsort(keys, kind="stable")
    keys, cnts = keys[order], cnts[order]
    starts = np.empty(len(keys), dtype=bool)
    starts[0] = True
    starts[1:] = keys[1:] != keys[:-1]
    idx = np.flatnonzero(starts)
    return keys[idx], np.add.reduceat(cnts, idx)


def _hot_bucket_keys(band_ds, cfg: PipelineConfig, id_col: str = "doc_id") -> list[int]:
    """Over-cap bucket keys, without a keyed shuffle.

    Per-block partial counts (one vectorized np.unique per block) are
    merged on the driver.  Small inputs merge exactly; large inputs are
    row-sampled first with a DETERMINISTIC hash filter (no RNG — resume
    runs see identical samples) and thresholded at half the expected
    sample count of a true over-cap bucket, so a hot bucket is missed
    only with exponentially small probability.  Ray's built-in
    groupby-count is avoided entirely: millions of groups pay per-group
    reduce overhead (~10x a numpy merge), and the heavy-hitter question
    doesn't need exact counts.
    """
    import ray
    from ..functions.hashing import splitmix64

    n_rows = band_ds.count()
    if n_rows == 0:
        return []
    frac = min(1.0, HOT_DETECT_SAMPLE_TARGET / max(n_rows, 1))
    cut = np.uint64(min(int(frac * (2**64 - 1)), 2**64 - 1))
    salt = np.uint64((cfg.seed * 0x9E3779B97F4A7C15) & (2**64 - 1))

    def _partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t["band_key"], dtype=np.int64)
        if frac < 1.0:
            d = np.asarray(t[id_col], dtype=np.int64).view(np.uint64)
            keep = splitmix64(k.view(np.uint64) ^ d ^ salt) <= cut
            k = k[keep]
        uniq, cnt = np.unique(k, return_counts=True)
        return pa.table({"band_key": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    parts = [ray.get(r) for r in
             band_ds.map_batches(_partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_arrow_refs()]
    parts = [t for t in parts if len(t)]
    if not parts:
        return []
    keys, totals = _merge_partial_counts(parts)
    threshold = cfg.band_bucket_cap * frac * (0.5 if frac < 1.0 else 1.0)
    return [int(k) for k in keys[totals > threshold]]


def _emit_run_pairs(keys: np.ndarray, ids: np.ndarray, cap: int
                    ) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized within-bucket pair emission over (key, id) rows that
    contain COMPLETE buckets.  Sorts by key, finds runs, drops over-cap
    runs (returning how many rows were dropped), and generates every
    canonical (a<b) pair of each run with numpy repeat/arange arithmetic
    — no Python loop over buckets or pairs."""
    if len(keys) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    starts = np.empty(len(keys), dtype=bool)
    starts[0] = True
    starts[1:] = keys[1:] != keys[:-1]
    run_start = np.flatnonzero(starts)
    run_len = np.diff(np.append(run_start, len(keys)))

    dropped = int(run_len[run_len > cap].sum())
    keep = (run_len >= 2) & (run_len <= cap)
    rs, rl = run_start[keep], run_len[keep]
    if len(rs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), dropped

    # element-level: for each kept run, element at local position p
    # starts (len-1-p) pairs with the elements after it
    el_idx = np.repeat(rs, rl) + _intra(rl)
    el_rep = np.repeat(rs + rl - 1, rl) - el_idx        # pairs started here
    total = int(el_rep.sum())
    a_idx = np.repeat(el_idx, el_rep)
    b_idx = a_idx + 1 + _intra(el_rep)
    a, b = ids[a_idx], ids[b_idx]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return lo, hi, dropped


def _intra(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(offs, lens)


def candidate_pairs(band_ds, cfg: PipelineConfig, id_col: str = "doc_id"):
    """(band_key, doc_id) rows → distinct canonical candidate pairs (a < b).

    Physical plan: two LOW-CARDINALITY partition shuffles, no joins and
    no per-bucket aggregates (millions of tiny groups pay per-group
    overhead in both Ray's groupby-count and hash joins):

      1. partition by ``hash(band_key) % P`` → every bucket lands whole
         in one partition → one vectorized sort-and-emit per partition
         produces its pairs, with EXACT over-cap bucket dropping (the
         skew guard) computed locally for free.
      2. partition by ``hash(a,b) % P`` → per-partition np.unique gives
         the globally distinct pair set (a pair collides in ≤ bands
         buckets, all mapping to the same hash partition).

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

    def _emit(group: pa.Table | None) -> pa.Table:
        if group is None or len(group) == 0:
            lo = hi = np.empty(0, np.int64)
        else:
            keys = np.asarray(group["band_key"], dtype=np.int64)
            ids = np.asarray(group[id_col], dtype=np.int64)
            lo, hi, _dropped = _emit_run_pairs(keys, ids, cap)
        # local pre-dedup: identical pairs from different buckets of the
        # same partition collapse here before the shuffle
        if len(lo):
            pk = np.stack([lo, hi], axis=1)
            pk = np.unique(pk, axis=0)
            lo, hi = pk[:, 0].copy(), pk[:, 1].copy()
        part = (splitmix64(lo.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                           ^ hi.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    pairs = hash_partition_map(parted, "part", _emit, n_parts)

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
