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


def candidate_pairs(band_ds, cfg: PipelineConfig, id_col: str = "doc_id"):
    """(band_key, doc_id) rows → distinct canonical candidate pairs (a < b).

    Returns a Dataset with columns ``a:int64, b:int64``.
    """
    import ray

    # skew guard: find over-cap buckets (boilerplate collapse) and
    # broadcast them as a blocklist — a handful of keys by construction,
    # so a ray.put lookup replaces a whole semi-join shuffle.  Singleton
    # buckets need no pre-filter: they contribute exactly their diagonal
    # row to the self-join, which the a<b filter drops.
    hot = band_ds.groupby("band_key").count().map_batches(
        lambda t: t.filter(pc.greater(t["count()"], cfg.band_bucket_cap))
                   .select(["band_key"]),
        batch_format="pyarrow",
    ).take_all()
    hot_keys = [r["band_key"] for r in hot]
    if hot_keys:
        hot_arr = pa.array(hot_keys, type=pa.int64())
        band_ds = band_ds.map_batches(
            lambda t, h=hot_arr: t.filter(
                pc.invert(pc.is_in(t["band_key"], value_set=h))),
            batch_format="pyarrow",
        )

    # pair emission: self-join within bucket, canonical a<b
    left = band_ds.rename_columns({id_col: "a"})
    right = band_ds.rename_columns({id_col: "b"})
    joined = left.join(
        right, join_type="inner", num_partitions=cfg.num_partitions,
        on=("band_key",),
    )
    pairs = joined.map_batches(
        lambda t: t.filter(pc.less(t["a"], t["b"])).select(["a", "b"]),
        batch_format="pyarrow",
    )
    # exact pair dedup (the reference's set-dedup A6, readMtxToCSR.cpp:112)
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


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
