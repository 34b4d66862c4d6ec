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
