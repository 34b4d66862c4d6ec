"""HITS (hubs & authorities) in exact integer fixed-point.

Kleinberg's algorithm is the natural complement to PageRank on a host
link graph: authorities = pages many good hubs point AT, hubs = pages
pointing at many good authorities (directory/spam-index detection).

Same oracle trick as stages/pagerank.py: scores are int64 in units of
``1/scale`` and every operation is floor arithmetic, so the K-iteration
mutual recursion unrolls into chained SQL CTEs and the driver
hash-compare is exact.  L1 normalization keeps it integer: after each
half-step, score[v] = (scale · raw[v]) // Σraw.  Bounds: normalized
scores sum to ≤ scale, so raw[v] ≤ scale and the product
scale·raw ≤ scale² — ``HITS_SCALE = 1e9`` keeps that inside int64
(documented invariant; the default must not be raised past ~3e9).

Semantics (mirrored by queries.SQL_HITS):
  * edges := distinct (src, dst); n := |{src} ∪ {dst}|
  * h0 = a0 = scale // n
  * iteration: a_raw[v] = Σ_{u→v} h[u];  a = (scale·a_raw) // Σa_raw
               h_raw[u] = Σ_{u→v} a[v];  h = (scale·h_raw) // Σh_raw
    (zero totals leave the vector all-zero — degenerate empty graph)

Physical plan: TWO static edge copies — partitioned by hash(src) for
the h→a half-step and by hash(dst) for a→h — state co-partitioned by
hash(node); each half-step is P message tasks (searchsorted lookup +
segment sums, partial totals returned inline) + a driver sum of P
scalars (the L1 total is inherently a barrier) + P normalize-merge
tasks.  Per-round traffic = partial-sum rows, never edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig

HITS_SCALE = 10 ** 9


def hits(edges_ds, cfg: PipelineConfig, *, n_iter: int = 4,
         scale: int = HITS_SCALE, src_col: str = "src",
         dst_col: str = "dst", fan: str = "auto",
         node_groups: int | None = None, counters=None):
    """edges(src,dst) → Dataset(node, hub_fp, auth_fp).

    ``fan`` / ``node_groups``: message-shard topology per half-step —
    'flat' / 'tree' / 'nodes' / 'auto', the shared stages/fan.py
    machinery (see its module docstring; 'nodes' is the multi-node
    two-level combine where only M² objects cross the network).  All
    fans are bit-identical: combines only reassociate integer sums."""
    import ray
    import ray.data as rd

    from ..functions.shuffle import hash_partition_map, part_of
    from .fan import FanPlan

    if scale * scale > 2 ** 63 - 1:
        raise ValueError(
            f"hits: scale={scale} breaks the scale² < 2⁶³ invariant "
            f"(normalized raw sums reach scale, so scale·raw wraps "
            f"int64); max ≈ 3.03e9")
    n_parts = cfg.resolved_partitions()

    def _hash_part(x: np.ndarray) -> np.ndarray:
        return part_of(x, n_parts)      # THE repo partition key

    def _tag(key_col, s_col=None, d_col=None):
        s_col, d_col = s_col or src_col, d_col or dst_col
        def _m(t: pa.Table) -> pa.Table:
            k = np.asarray(t[key_col], dtype=np.int64)
            return pa.table({"src": t[s_col].combine_chunks(),
                             "dst": t[d_col].combine_chunks(),
                             "part": pa.array(_hash_part(k), pa.int64())})
        return _m

    def _dedup(sort_key):
        def _d(tab):
            if tab is None or len(tab) == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())})
            s = np.asarray(tab["src"], dtype=np.int64)
            d = np.asarray(tab["dst"], dtype=np.int64)
            cols = (s, d) if sort_key == "src" else (d, s)
            pk = np.unique(np.stack(cols, axis=1), axis=0)
            s2, d2 = (pk[:, 0], pk[:, 1]) if sort_key == "src" \
                else (pk[:, 1], pk[:, 0])
            return pa.table({"src": pa.array(s2, pa.int64()),
                             "dst": pa.array(d2, pa.int64())})
        return _d

    by_src_ds = hash_partition_map(
        edges_ds.map_batches(_tag(src_col), batch_format="pyarrow",
                             zero_copy_batch=True),
        "part", _dedup("src"), n_parts)
    by_src = by_src_ds.to_arrow_refs()
    # the by-dst copy re-exchanges the ALREADY-DEDUPED src blocks (the
    # distinct edge set is direction-independent), so the upstream
    # edges_ds pipeline executes exactly once
    by_dst = hash_partition_map(
        rd.from_arrow_refs(list(by_src)).map_batches(
            _tag("dst", "src", "dst"), batch_format="pyarrow",
            zero_copy_batch=True),
        "part", _dedup("dst"), n_parts).to_arrow_refs()

    @ray.remote(num_returns=n_parts)
    def _node_splits(edge_tab):
        s = np.asarray(edge_tab["src"], dtype=np.int64)
        d = np.asarray(edge_tab["dst"], dtype=np.int64)
        nodes = np.unique(np.concatenate([s, d]))
        part = _hash_part(nodes)
        order = np.argsort(part, kind="stable")
        nodes, part = nodes[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        return tuple(pa.table({"node": pa.array(nodes[bounds[p]:bounds[p + 1]],
                                                pa.int64())})
                     for p in range(n_parts))

    @ray.remote(num_returns=2)
    def _init_state(*tabs):
        tabs = [t for t in tabs if len(t)]
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "hub_fp": pa.array([], pa.int64()),
                          "auth_fp": pa.array([], pa.int64())})
        if not tabs:
            return empty, 0
        nodes = np.unique(np.concatenate(
            [np.asarray(t["node"], dtype=np.int64) for t in tabs]))
        z = np.zeros(len(nodes), dtype=np.int64)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "hub_fp": pa.array(z), "auth_fp": pa.array(z)}), \
            len(nodes)

    splits = [_node_splits.remote(b) for b in by_src]
    merged = [_init_state.remote(*[s[p] for s in splits])
              for p in range(n_parts)]
    state_blocks = [m[0] for m in merged]
    n_nodes = int(sum(ray.get([m[1] for m in merged])))
    if n_nodes == 0:
        return rd.from_arrow([pa.table({
            "node": pa.array([], pa.int64()),
            "hub_fp": pa.array([], pa.int64()),
            "auth_fp": pa.array([], pa.int64())})])

    @ray.remote
    def _seed(state_tab, v):
        n = len(state_tab)
        arr = pa.array(np.full(n, v, np.int64))
        return state_tab.set_column(1, "hub_fp", arr) \
            .set_column(2, "auth_fp", arr)

    state_blocks = [_seed.remote(s, scale // n_nodes) for s in state_blocks]

    plan = FanPlan(fan, n_parts, node_groups)

    @ray.remote
    def _prep(edge_tab, out_col):
        """Round-invariant routing for the block's OUT column (the
        grouping/sort is identical every half-step — compute once)."""
        out = np.asarray(edge_tab[out_col], dtype=np.int64)
        uo, inv = (np.unique(out, return_inverse=True) if len(out)
                   else (out, out))
        part = _hash_part(uo)
        order = np.argsort(part, kind="stable")
        slot = np.empty(len(uo), dtype=np.int64)
        slot[order] = np.arange(len(uo))
        inv2 = slot[inv] if len(out) else inv
        part_s = part[order]
        bounds = np.searchsorted(part_s, np.arange(n_parts + 1))
        return uo[order], inv2, part_s, bounds

    prep_src = [_prep.remote(b, "dst") for b in by_src]   # h → a routes dst
    prep_dst = [_prep.remote(b, "src") for b in by_dst]   # a → h routes src

    # direction: "fwd" reads hub at src (edge blocks by_src, co-located
    # with state) and routes to dst; "rev" reads auth at dst (by_dst)
    # and routes to src.  Shards are grouped by destination partition
    # CHUNK (fan.py contract); flat is the chunk=1 case.  Called with
    # .options(num_returns=plan.n_chunks + 1).
    @ray.remote
    def _messages(edge_tab, prep, state_tab, read_col, key_col):
        node = np.asarray(state_tab["node"], dtype=np.int64)
        val = np.asarray(state_tab[read_col], dtype=np.int64)
        key = np.asarray(edge_tab[key_col], dtype=np.int64)
        from .fan import EMPTY_MSG
        if not len(key):
            return (*[EMPTY_MSG] * plan.n_chunks, 0)
        uo_s, inv2, part_s, bounds = prep
        pos = np.searchsorted(node, key)      # key is local by layout
        contrib = val[pos]
        inc = np.zeros(len(uo_s), dtype=np.int64)
        np.add.at(inc, inv2, contrib)
        total = int(inc.sum())
        cb = bounds[np.minimum(np.arange(plan.n_chunks + 1) * plan.chunk,
                               n_parts)]
        outs = [pa.table({"node": pa.array(uo_s[cb[g]:cb[g + 1]],
                                           pa.int64()),
                          "inc": pa.array(inc[cb[g]:cb[g + 1]],
                                          pa.int64()),
                          "part": pa.array(part_s[cb[g]:cb[g + 1]],
                                           pa.int64())})
                for g in range(plan.n_chunks)]
        return (*outs, total)

    @ray.remote
    def _normalize_merge(state_tab, total, col_idx, col_name, *msg_tabs):
        node = np.asarray(state_tab["node"], dtype=np.int64)
        raw = np.zeros(len(node), dtype=np.int64)
        for m in msg_tabs:
            if not len(m):
                continue
            mn = np.asarray(m["node"], dtype=np.int64)
            mi = np.asarray(m["inc"], dtype=np.int64)
            pos = np.searchsorted(node, mn)
            raw[pos] += mi
        new = (scale * raw) // total if total > 0 \
            else np.zeros(len(node), dtype=np.int64)
        return state_tab.set_column(col_idx, col_name,
                                    pa.array(new, pa.int64()))

    def _merge_opts(q: int) -> dict:
        return plan.aff(q // plan.ppn) if plan.mode == "nodes" else {}

    def _half_step(edge_blocks_dir, prep_dir, read_col, key_col,
                   col_idx, col_name, state_blocks):
        msg = [_messages.options(**plan.msg_options(p, 1))
               .remote(edge_blocks_dir[p], prep_dir[p], state_blocks[p],
                       read_col, key_col)
               for p in range(n_parts)]
        total = sum(ray.get([m[plan.n_chunks] for m in msg]))
        routed = plan.combine([m[:plan.n_chunks] for m in msg])
        return [_normalize_merge.options(**_merge_opts(q)).remote(
            state_blocks[q], total, col_idx, col_name, *routed[q])
            for q in range(n_parts)]

    for _ in range(n_iter):
        state_blocks = _half_step(by_src, prep_src, "hub_fp", "src",
                                  2, "auth_fp", state_blocks)   # h → a
        state_blocks = _half_step(by_dst, prep_dst, "auth_fp", "dst",
                                  1, "hub_fp", state_blocks)    # a → h

    if counters is not None:
        counters.add.remote({"hits_rounds": n_iter,
                             "hits_nodes": n_nodes,
                             f"hits_fan_{plan.mode}": 1,
                             "hits_msg_objects_per_round":
                                 2 * plan.msg_objects,
                             "hits_crossnode_objects_per_round":
                                 2 * plan.crossnode_objects})

    out_refs = list(state_blocks)
    ray.wait(out_refs, num_returns=len(out_refs))   # see pagerank._emit note
    return rd.from_arrow_refs(out_refs)
