"""Exact deduplication + text fingerprinting stages.

Exact dedup = content hash → hash-partitioned group → keep the minimum
doc_id per group (the reference's COO set-dedup A6 at corpus scale,
SURVEY.md §2.7).  The group step is expressed as a pre-aggregated
groupby: a per-batch partial min inside ``map_batches`` first, so the
shuffle moves one row per (hash, batch) instead of every row.

Content keys are 128-bit (two independent 64-bit SipHash draws): a
single 64-bit key has birthday collisions near 2^32 docs, far below the
10^12-doc design point of BASELINE.json.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.hashing import hash_strings

_KEY2 = "raydedup-2nd-key"  # 16-byte alternate SipHash key → independent hash

_HASH_COLS = ["text_hash", "text_hash2"]


def with_text_hash(ds, text_col: str = "text"):
    """Append deterministic (text_hash, text_hash2) uint64 columns."""

    def _hash(batch: pa.Table) -> pa.Table:
        arr = pc.fill_null(batch[text_col], "").to_numpy(zero_copy_only=False)
        h1 = hash_strings(arr)
        obj = np.asarray(arr, dtype=object)
        h2 = (pd.util.hash_array(obj, hash_key=_KEY2, categorize=False)
              if len(obj) else np.empty(0, dtype=np.uint64))
        # int64 bit-view: shuffle keys must stay native Arrow ints
        batch = batch.append_column(
            "text_hash", pa.array(h1.view(np.int64), type=pa.int64()))
        return batch.append_column(
            "text_hash2", pa.array(h2.view(np.int64), type=pa.int64()))

    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)


def with_md5_fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """Append an md5 hex-digest fingerprint column (matches DuckDB md5())."""

    def _md5(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "").to_pylist()
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        return batch.append_column(out_col, pa.array(fps, type=pa.string()))

    return ds.map_batches(_md5, batch_format="pyarrow")


def exact_dup_groups(ds, cfg: PipelineConfig, id_col: str = "doc_id",
                     text_col: str = "text"):
    """→ Dataset(text_hash, text_hash2, keep_id:int64, n_dups:int64):
    one row per distinct text, with the canonical (min) doc id and the
    group size."""
    hashed = with_text_hash(ds.select_columns([id_col, text_col]), text_col)

    # partial (combiner) aggregation inside each batch before the shuffle
    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "text_hash": np.asarray(batch["text_hash"], dtype=np.int64),
            "text_hash2": np.asarray(batch["text_hash2"], dtype=np.int64),
            id_col: np.asarray(batch[id_col], dtype=np.int64),
        })
        g = (df.groupby(_HASH_COLS, sort=False)[id_col]
               .agg(["min", "count"]).reset_index())
        return pa.table({
            "text_hash": pa.array(g["text_hash"].to_numpy(), type=pa.int64()),
            "text_hash2": pa.array(g["text_hash2"].to_numpy(), type=pa.int64()),
            "partial_min": pa.array(g["min"].to_numpy(), type=pa.int64()),
            "partial_n": pa.array(g["count"].to_numpy(), type=pa.int64()),
        })

    partials = hashed.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partials.groupby(_HASH_COLS).aggregate(*_min_sum_aggs())
    return agg.map_batches(
        lambda t: pa.table({
            "text_hash": t["text_hash"],
            "text_hash2": t["text_hash2"],
            "keep_id": t["min(partial_min)"],
            "n_dups": t["sum(partial_n)"],
        }),
        batch_format="pyarrow",
    )


def _min_sum_aggs():
    from ray.data.aggregate import Min, Sum
    return (Min("partial_min"), Sum("partial_n"))


def exact_dedup(ds, cfg: PipelineConfig, id_col: str = "doc_id",
                text_col: str = "text"):
    """Keep exactly one row (the min doc_id) per distinct text.
    Returns the deduplicated Dataset with the original columns.

    Physical plan: ONE manual hash exchange — full rows are partitioned
    by content hash (each dup group lands whole in one partition) and
    the min-doc_id row per 128-bit-hash group is kept in-partition.
    This replaces the earlier exact_dup_groups + ``ds.join`` plan: the
    keep-list side is ~corpus-sized (one row per distinct text), so the
    join was a second full shuffle through Ray's sort-based exchange —
    the path this repo measured slow everywhere else (verify.py)."""
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()
    out_schema = ds.schema().base_schema

    def _tag(t: pa.Table) -> pa.Table:
        h = np.asarray(t["text_hash"], dtype=np.int64)
        part = (np.asarray(splitmix64(h.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    tagged = with_text_hash(ds, text_col).map_batches(
        _tag, batch_format="pyarrow", zero_copy_batch=True)

    def _keep(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return out_schema.empty_table()
        h1 = np.asarray(tab["text_hash"], dtype=np.int64)
        h2 = np.asarray(tab["text_hash2"], dtype=np.int64)
        ids = np.asarray(tab[id_col], dtype=np.int64)
        order = np.lexsort((ids, h2, h1))
        h1s, h2s = h1[order], h2[order]
        starts = np.empty(len(order), dtype=bool)
        starts[0] = True
        starts[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        keep_rows = np.sort(order[starts])    # min id per group, in
        out = tab.take(pa.array(keep_rows, pa.int64()))  # original order
        return out.select(out_schema.names)

    return hash_partition_map(tagged, "part", _keep, n_parts)


def keep_earliest(ds, cfg: PipelineConfig, ts_col: str = "crawl_ts",
                  id_col: str = "doc_id", text_col: str = "text"):
    """Snapshot-aware exact dedup: keep, per distinct text, the row with
    the minimum (``ts_col``, ``id_col``) — "the earliest crawl of each
    page", the keep rule a multi-snapshot Common-Crawl corpus needs
    (later re-crawls of identical content are the duplicates).

    Same ONE-exchange physical plan as :func:`exact_dedup` (each dup
    group lands whole in one partition via the 128-bit content hash);
    only the in-partition keep rule changes: lexicographic min over
    (timestamp, id) instead of min id.  ``ts_col`` may be any Arrow
    type with a total order under int64 cast (timestamp[*], int, date).
    """
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()
    out_schema = ds.schema().base_schema

    def _tag(t: pa.Table) -> pa.Table:
        h = np.asarray(t["text_hash"], dtype=np.int64)
        part = (np.asarray(splitmix64(h.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    tagged = with_text_hash(ds, text_col).map_batches(
        _tag, batch_format="pyarrow", zero_copy_batch=True)

    def _keep(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return out_schema.empty_table()
        h1 = np.asarray(tab["text_hash"], dtype=np.int64)
        h2 = np.asarray(tab["text_hash2"], dtype=np.int64)
        ts = np.asarray(pc.cast(tab[ts_col].combine_chunks(), pa.int64()),
                        dtype=np.int64)
        ids = np.asarray(tab[id_col], dtype=np.int64)
        order = np.lexsort((ids, ts, h2, h1))
        h1s, h2s = h1[order], h2[order]
        starts = np.empty(len(order), dtype=bool)
        starts[0] = True
        starts[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        keep_rows = np.sort(order[starts])   # earliest row per group,
        out = tab.take(pa.array(keep_rows, pa.int64()))  # original order
        return out.select(out_schema.names)

    return hash_partition_map(tagged, "part", _keep, n_parts)


EXACT_PAIRS_MAX_GROUP = 1000   # all-pairs enumeration cap per dup group


def exact_dup_pairs(ds, cfg: PipelineConfig, id_col: str = "doc_id",
                    text_col: str = "text",
                    max_group_size: int = EXACT_PAIRS_MAX_GROUP,
                    counters=None):
    """Canonical pairs (a<b) of byte-identical texts.

    Physical plan: hash-partition rows by content hash (each dup group
    lands whole in one partition), then vectorized within-group pair
    emission — no self-join, so a text duplicated N times costs one
    N-row group, not an N² join intermediate.  Groups LARGER than
    ``max_group_size`` (boilerplate floods) emit the linear star
    (min_id, member) pairs instead of the quadratic enumeration —
    connectivity (and exact_dup_components) is identical; only the
    redundant transitive pairs are dropped, and the count is surfaced
    through ``counters`` (`exact_overcap_groups/rows`).
    """
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map
    from .lsh import _all_pairs_of_runs

    n_parts = cfg.resolved_partitions()
    hashed = with_text_hash(ds.select_columns([id_col, text_col]), text_col) \
        .select_columns([id_col, *_HASH_COLS])

    def _tag(t: pa.Table) -> pa.Table:
        h = np.asarray(t["text_hash"], dtype=np.int64)
        part = (np.asarray(splitmix64(h.view(np.uint64)))
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def _emit(tab: pa.Table | None) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if tab is None or len(tab) == 0:
            return empty
        h1 = np.asarray(tab["text_hash"], dtype=np.int64)
        h2 = np.asarray(tab["text_hash2"], dtype=np.int64)
        ids = np.asarray(tab[id_col], dtype=np.int64)
        order = np.lexsort((ids, h2, h1))
        h1, h2, ids = h1[order], h2[order], ids[order]
        starts = np.empty(len(h1), dtype=bool)
        starts[0] = True
        starts[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        run_id = np.cumsum(starts) - 1            # group index per row
        rs = np.flatnonzero(starts)
        rl = np.diff(np.append(rs, len(h1)))
        over = rl > max_group_size
        if over.any() and counters is not None:
            # fire-and-forget: the in-flight-add race with a driver
            # read is absorbed by RunCounters.get()'s settle loop
            counters.add.remote(
                {"exact_overcap_groups": int(over.sum()),
                 "exact_overcap_rows": int(rl[over].sum())})
        small = ~over
        sel = np.repeat(small, rl)
        lo, hi = _all_pairs_of_runs(run_id[sel], ids[sel])
        if over.any():
            # star: every member pairs with the group's min id (ids are
            # sorted within the run, so the first element is the min)
            stars_a, stars_b = [], []
            for s, l in zip(rs[over], rl[over]):
                mem = ids[s + 1: s + l]
                stars_a.append(np.full(l - 1, ids[s], dtype=np.int64))
                stars_b.append(mem)
            lo = np.concatenate([lo, *stars_a])
            hi = np.concatenate([hi, *stars_b])
        if not len(lo):
            return empty
        return pa.table({"a": pa.array(lo, pa.int64()),
                         "b": pa.array(hi, pa.int64())})

    tagged = hashed.map_batches(_tag, batch_format="pyarrow",
                                zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _emit, n_parts)
