"""General equi-join primitives.

The specialized joins in this repo (verify.py's two-pass candidate ⋈
signature attach, temporal.py's as-of) are shapes the reference needed;
a user replacing a general engine also joins plain relations (facts ⋈
dims, corpus ⋈ metadata).  Two physical plans behind one surface:

* ``broadcast_join`` — the dim-table case: the small side is collected
  once, shipped via ``ray.put``, and every batch runs ONE Arrow C++
  (Acero) hash join against it.  The small side must actually be small
  — a hard row gate raises rather than silently collecting a corpus.
* ``partitioned_join`` — both sides big: each side moves exactly once
  through the manual hash exchange keyed by the join key, and the P
  co-partitioned block pairs are joined independently (zip-by-partition
  — ``hash_partition_map`` returns blocks in partition order).  This is
  the 100-TB path: shuffle volume is |L|+|R|, no driver materialization.

Join keys: int64 or string, single column (the common engine case;
composite keys can be pre-concatenated by the caller).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_utf8_array, splitmix64
from ..functions.shuffle import hash_partition_map

BROADCAST_JOIN_MAX_ROWS = 5_000_000

_JOIN_TYPES = {"inner": "inner", "left": "left outer",
               "semi": "left semi", "anti": "left anti"}


def broadcast_join(left_ds, right, on: str, *, how: str = "inner",
                   right_on: str | None = None,
                   max_rows: int = BROADCAST_JOIN_MAX_ROWS):
    """Join a Dataset against a SMALL side (Dataset or pyarrow Table).

    The right side is collected to one Arrow table (gated at
    ``max_rows``), broadcast once, and each left batch is joined with
    Arrow's C++ hash join — zero shuffle, the left side streams."""
    import ray

    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    rtab = _collect_small(right, max_rows)
    right_key = right_on or on
    r_ref = ray.put(rtab)
    join_type = _JOIN_TYPES[how]

    def _join(t: pa.Table) -> pa.Table:
        r = ray.get(r_ref)
        return t.join(r, keys=[on], right_keys=[right_key],
                      join_type=join_type)

    return left_ds.map_batches(_join, batch_format="pyarrow",
                               zero_copy_batch=True)


def partitioned_join(left_ds, right_ds, on: str,
                     cfg: PipelineConfig = DEFAULT_CONFIG, *,
                     how: str = "inner", right_on: str | None = None):
    """Join two big Datasets: both sides exchanged once by hash(key),
    then each co-partitioned block pair is joined independently."""
    import ray
    import ray.data as rd

    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    n_parts = cfg.num_partitions
    join_type = _JOIN_TYPES[how]
    right_key = right_on or on

    # capture schemas up front so empty exchange partitions (which Ray
    # normalizes to zero-column tables) join with consistent schemas
    l_sch, r_sch = _pa_schema(left_ds), _pa_schema(right_ds)
    left_parts = _exchange_by_key(left_ds, on, n_parts, cfg)
    right_parts = _exchange_by_key(right_ds, right_key, n_parts, cfg)

    @ray.remote
    def _join(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt is None or lt.num_columns == 0:
            lt = l_sch.empty_table()
        if rt is None or rt.num_columns == 0:
            rt = r_sch.empty_table()
        return lt.join(rt, keys=[on], right_keys=[right_key],
                       join_type=join_type)

    l_refs = left_parts.to_arrow_refs()
    r_refs = right_parts.to_arrow_refs()
    return rd.from_arrow_refs(
        [_join.remote(l, r) for l, r in zip(l_refs, r_refs)])


def _collect_small(right, max_rows: int) -> pa.Table:
    import ray
    import ray.data as rd

    if isinstance(right, pa.Table):
        tab = right
    elif isinstance(right, rd.Dataset):
        tabs = [t for t in ray.get(list(right.to_arrow_refs())) if len(t)]
        tab = pa.concat_tables(tabs) if tabs else pa.table({})
    else:
        raise TypeError(f"unsupported small side: {type(right)}")
    if len(tab) > max_rows:
        raise ValueError(
            f"broadcast_join small side has {len(tab)} rows "
            f"(> {max_rows}); use partitioned_join")
    return tab.combine_chunks()


def _key_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_utf8_array(col)
    return splitmix64(np.asarray(col.cast(pa.int64()),
                                 dtype=np.int64).view(np.uint64))


def _exchange_by_key(ds, key: str, n_parts: int, cfg: PipelineConfig):
    def _tag(t: pa.Table) -> pa.Table:
        h = _key_hash(t[key])
        return t.append_column(
            "_part", pa.array((h % np.uint64(n_parts)).astype(np.int64),
                              pa.int64()))

    def _ident(t: pa.Table | None) -> pa.Table:
        return t if t is not None else pa.table({})

    return hash_partition_map(ds, "_part", _ident, n_parts, map_fn=_tag,
                              map_chunk_rows=cfg.batch_size)


def _pa_schema(ds) -> pa.Schema:
    s = ds.schema()
    return getattr(s, "base_schema", s)
