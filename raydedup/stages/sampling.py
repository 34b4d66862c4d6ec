"""Corpus-balancing sampling operators.

``quota_per_key`` caps how many rows each key contributes (the "at most
N docs per domain/source" rebalancing step every crawl pipeline runs
before training): ONE hash exchange by key, then a per-partition Arrow
sort + run-length cut — the per-key rank never exists as Python state,
and no key's rows cross partitions, so per-partition cuts are globally
correct.  Deterministic: rows are ranked by ``order_col``, so the kept
set is a pure function of the input, not of arrival order (matching the
SQL ``row_number() OVER (PARTITION BY key ORDER BY order)`` oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array, splitmix64
from ..functions.shuffle import hash_partition_map


def _key_hash(col) -> np.ndarray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_utf8_array(col)
    return splitmix64(np.asarray(col.cast(pa.int64()),
                                 dtype=np.int64).view(np.uint64))


def quota_per_key(ds, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                  key_col: str, order_col: str, n: int):
    """Keep at most ``n`` rows per distinct ``key_col`` value, the first
    ``n`` in ascending ``order_col`` order; original columns pass
    through unchanged."""
    n_parts = cfg.resolved_partitions()
    schema = ds.schema()
    cols = list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def _tag(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in cols}
        out["part"] = pa.array(
            (_key_hash(t[key_col].combine_chunks())
             % np.uint64(n_parts)).astype(np.int64), pa.int64())
        return pa.table(out)

    empty = pa.table({c: pa.array([], types[c]) for c in cols})

    def _cut(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        tab = tab.sort_by([(key_col, "ascending"), (order_col, "ascending")])
        idx = np.asarray(
            pc.dictionary_encode(tab[key_col].combine_chunks()).indices,
            dtype=np.int64)
        new = np.empty(len(idx), dtype=bool)
        new[0] = True
        new[1:] = idx[1:] != idx[:-1]
        starts = np.flatnonzero(new)
        rn = np.arange(len(idx)) - np.repeat(
            starts, np.diff(np.append(starts, len(idx))))
        return tab.filter(pa.array(rn < n)).select(cols)

    tagged = ds.map_batches(_tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    return hash_partition_map(tagged, "part", _cut, n_parts)


def mix_sample(ds, weights: dict[str, float], *,
               key_col: str = "source", id_col: str = "doc_id",
               default_weight: float = 1.0, method: str = "splitmix",
               seed: int = 0):
    """Source-weighted downsampling: keep each row with probability
    ``weights[key]`` (1.0 = keep all, 0.0 = drop all; keys absent from
    ``weights`` use ``default_weight``) — the train-mix rebalancing
    step (e.g. "web × 0.3, wiki × 1.0") every corpus build runs.

    Deterministic per ROW, not per run: the keep decision is a pure
    function of (id, seed), so re-runs, resumed shards and different
    partition layouts select the SAME rows — and the selection is
    independent of the corpus's partition/arrival order.  Zero shuffle:
    one streaming ``map_batches`` filter; the weight table is a plain
    broadcast-by-closure dict (bounded by the number of sources).

    ``method``:
      * ``"splitmix"`` (default) — keep iff
        ``splitmix64(id XOR seed) / 2^64 < w``.  Vectorized, the
        10^12-doc path.
      * ``"md5"`` — keep iff the top-8-hex-digit fraction of
        ``md5(str(id))`` < w.  Per-row hashlib (fixture scale only),
        exists so the driver oracle can reproduce the exact kept set in
        DuckDB (``md5()`` parity, like with_md5_fingerprint); both
        methods are statistically equivalent samplers.
    """
    schema = ds.schema()
    cols = list(schema.names)

    def _keep_mask(t: pa.Table) -> np.ndarray:
        keys = t[key_col].combine_chunks().to_pylist()
        w = np.asarray([weights.get(k, default_weight) for k in keys],
                       dtype=np.float64)
        ids = np.asarray(t[id_col], dtype=np.int64)
        if method == "md5":
            import hashlib
            frac = np.asarray(
                [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                 for i in ids], dtype=np.float64) / float(1 << 32)
        else:
            h = splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
            frac = h.astype(np.float64) / float(2**64)
        return frac < w

    def _filter(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_keep_mask(t))).select(cols)

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)


def corpus_split(ds, splits: dict[str, float], *,
                 id_col: str = "doc_id", method: str = "splitmix",
                 seed: int = 0, out_col: str = "split",
                 only: str | None = None):
    """Deterministic named partitioning of a corpus into train/val/test
    (or any weighted split set): every row gets exactly one label from
    ``splits`` (weights normalized to 1; label chosen by which
    cumulative-weight interval the row's hash fraction falls in).

    Same contract as ``mix_sample``: the label is a pure function of
    (id, seed) — re-runs, resumed shards and any partition layout
    assign identically, and membership in one split never depends on
    having seen the others.  Zero shuffle, one streaming map.

    ``method``: ``"splitmix"`` (vectorized scale path) or ``"md5"``
    (per-row hashlib, fixture scale — exists for DuckDB ``md5()``
    oracle parity, mirroring mix_sample).

    ``only``: return just that split's rows (label column omitted) —
    the "materialize the training corpus" shape; default annotates all
    rows with ``out_col``.
    """
    names = list(splits.keys())
    w = np.asarray([splits[k] for k in names], dtype=np.float64)
    if (w < 0).any() or w.sum() <= 0:
        raise ValueError("split weights must be non-negative, sum > 0")
    bounds = np.cumsum(w / w.sum())[:-1]          # upper bounds, open
    if only is not None and only not in splits:
        raise ValueError(f"unknown split {only!r}")
    schema = ds.schema()
    cols = list(schema.names)

    def _frac(t: pa.Table) -> np.ndarray:
        ids = np.asarray(t[id_col], dtype=np.int64)
        if method == "md5":
            import hashlib
            return np.asarray(
                [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                 for i in ids], dtype=np.float64) / float(1 << 32)
        h = splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
        return h.astype(np.float64) / float(2**64)

    def _assign(t: pa.Table) -> pa.Table:
        lab = np.searchsorted(bounds, _frac(t), side="right")
        if only is not None:
            return t.filter(pa.array(lab == names.index(only))) \
                    .select(cols)
        out = {c: t[c] for c in cols}
        out[out_col] = pa.array(np.asarray(names, dtype=object)[lab],
                                pa.string())
        return pa.table(out)

    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)
