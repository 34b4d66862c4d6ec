"""Manual two-stage hash shuffle over raw Ray tasks.

Ray Data's keyed exchanges (groupby / join / sort) all funnel through a
sort-based or aggregator-actor shuffle that measured ~60 MB/s on this
node regardless of CPU count — the bottleneck for every wide step once
kernels are vectorized.  A hash partition doesn't need a sort: map tasks
slice each block into P sub-blocks by the precomputed partition column
(one argsort per block, zero-copy slices), reduce tasks concatenate a
partition's sub-blocks and apply the per-partition function.  Both
stages are plain data-parallel Ray tasks through the object store —
this is the documented "raw Ray tasks as a last resort" case
(SURVEY.md §2 custom-operators rule): the Dataset API expresses the
semantics but not the required exchange throughput.

Contract: ``part_col`` holds int64 values in [0, n_parts); ``fn``
receives ONE complete partition as a pyarrow Table (part_col dropped)
and returns a pyarrow Table.  The result is a Dataset of n_parts
blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def part_of(keys: np.ndarray, n_parts: int) -> np.ndarray:
    """THE partition key for int64 ids/hashes across every exchange in
    the repo: splitmix64 before the modulo (raw ``id % n_parts`` skews
    badly on strided or residue-clustered key spaces).  One definition
    so a future change (salting, signedness) cannot silently diverge
    between stages."""
    from .hashing import splitmix64

    return (splitmix64(keys.view(np.uint64))
            % np.uint64(n_parts)).astype(np.int64)


def hash_partition_map(ds, part_col: str, fn, n_parts: int, map_fn=None,
                       map_chunk_rows: int | None = None,
                       split_tasks: int | None = None):
    """``map_fn`` (optional): a pa.Table -> pa.Table transform applied to
    every input block INSIDE the split tasks, before partitioning — the
    map side of the exchange fused into the shuffle, so the mapped rows
    (e.g. exploded LSH band rows, 15-30x the input volume) are sliced and
    shipped once instead of being materialized to the object store first.
    The un-mapped input blocks need not carry ``part_col``; map_fn's
    output must.

    ``map_chunk_rows``: slice each block into at-most-this-many-row
    chunks before calling map_fn — the n·log n / cache-sensitive kernels
    inside map_fns regress superlinearly on the coalesced 10-100k-row
    blocks a materialized Dataset hands out (ROUND1_NOTES §6, §11).

    When map_fn is set and there are fewer blocks than useful split
    tasks, each block is handed to several split tasks with (i, k) range
    specs (the task slices its share locally — on one node the shared
    block read is zero-copy), so map parallelism is never capped by the
    upstream block count; the fan is sized from actual row counts so a
    tiny input is not shredded into task confetti.  ``split_tasks``
    optionally caps the split-task count outright.
    """
    import ray
    import ray.data as rd

    @ray.remote(num_returns=n_parts)
    def _split(spec, *tabs):
        if spec is not None:
            i, k = spec
            tabs = [t.slice(i * len(t) // k, (i + 1) * len(t) // k
                            - i * len(t) // k) for t in tabs]
        if map_fn is not None:
            ins = [t for t in tabs if t.num_columns > 0 and len(t)]
            tabs = []
            for t in ins:
                if map_chunk_rows and len(t) > map_chunk_rows:
                    tabs.extend(map_fn(t.slice(j, map_chunk_rows))
                                for j in range(0, len(t), map_chunk_rows))
                else:
                    tabs.append(map_fn(t))
        # Ray normalizes empty blocks to empty-SCHEMA tables: drop them
        tabs = [t for t in tabs
                if len(t) and part_col in t.column_names]
        if not tabs:
            empty = pa.table({})
            return tuple(empty for _ in range(n_parts)) if n_parts > 1 else empty
        tab = pa.concat_tables(tabs, promote_options="default")
        part = np.asarray(tab[part_col], dtype=np.int64)
        tab = tab.drop_columns([part_col])
        if n_parts <= 256:
            order = np.argsort(part.astype(np.uint8), kind="stable")  # radix
        else:
            order = np.argsort(part, kind="stable")
        sorted_part = part[order]
        bounds = np.searchsorted(sorted_part, np.arange(n_parts + 1))
        taken = tab.take(pa.array(order, pa.int64()))
        out = [taken.slice(bounds[p], bounds[p + 1] - bounds[p])
               for p in range(n_parts)]
        return tuple(out) if n_parts > 1 else out[0]

    @ray.remote
    def _reduce(*tabs):
        tabs = [t for t in tabs
                if t is not None and len(t) and t.num_columns > 0]
        if not tabs:
            return fn(None)
        tab = pa.concat_tables(tabs, promote_options="default")
        return fn(tab)

    blocks = ds.to_arrow_refs()
    # bundle blocks so total shuffle objects stay ~tasks x partitions,
    # not blocks x partitions — tiny-object overhead otherwise dominates
    import math
    n_split_tasks = max(n_parts, _cpu_count() * 2)
    if split_tasks is not None:
        n_split_tasks = max(1, min(n_split_tasks, split_tasks))
    if map_fn is not None and 0 < len(blocks) < n_split_tasks:
        # fan each block out to k range-slicing tasks — but never fan a
        # small input into task confetti: size the fan so each task gets
        # at least a few map chunks (block row counts are cheap here:
        # the blocks are already materialized tables)
        @ray.remote
        def _nrows(t):
            return len(t)

        rows = sum(ray.get([_nrows.remote(b) for b in blocks]))
        per_chunk = (map_chunk_rows or 4096)
        want = max(1, rows // (per_chunk * 2))
        n_split_tasks = min(n_split_tasks, max(len(blocks), want))
        k = math.ceil(n_split_tasks / len(blocks))
        split_refs = [_split.remote((i, k), b)
                      for b in blocks for i in range(k)]
    else:
        per_task = max(1, math.ceil(len(blocks) / n_split_tasks))
        groups = [blocks[i:i + per_task]
                  for i in range(0, len(blocks), per_task)]
        split_refs = [_split.remote(None, *g) for g in groups]
    if n_parts == 1:
        split_refs = [[r] for r in split_refs]
    reduced = [_reduce.remote(*[sr[p] for sr in split_refs])
               for p in range(n_parts)]
    return rd.from_arrow_refs(reduced)


def _cpu_count() -> int:
    import ray
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8
