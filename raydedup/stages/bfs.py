"""Multi-source BFS hop distances over a directed link graph.

"How many clicks from a trusted seed set is this host?" — the distance
signal behind TrustRank-style spam demotion and crawl-frontier
prioritization.  Bounded-hop BFS with exact integer distances, so (like
stages/pagerank.py) the whole iteration unrolls into chained SQL CTEs
and the driver hash-compare is exact — the second iterative operator
with a bit-exact oracle.

Semantics (mirrored by queries.SQL_HOST_DISTANCES):
  * nodes = {src} ∪ {dst} of the distinct edge set;
  * dist0 = 0 for seeds (seeds not in the graph are ignored), else ∞;
  * hop i: dist_i(v) = min(dist_{i-1}(v),
                           1 + min over edges u→v of dist_{i-1}(u));
  * after ``max_hops`` rounds, rows with finite distance are emitted.

Physical plan (cc.py layout): edges exchanged ONCE by hash(src) and
never move again; distance state co-partitioned by the same hash; each
round = P frontier tasks (only nodes whose distance CHANGED last round
propagate — classic frontier BFS, so per-round traffic is the frontier's
out-edges, not the graph) + P min-merge tasks.  Early-exit when the
frontier is empty, so max_hops is a bound, not a cost.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig

UNREACHED = np.int64(2 ** 62)     # "infinity" sentinel, never emitted


def bfs_distances(edges_ds, seeds, cfg: PipelineConfig, *,
                  max_hops: int = 8, src_col: str = "src",
                  dst_col: str = "dst", counters=None):
    """edges(src,dst) + seed node ids → Dataset(node, dist) for every
    node reachable from a seed within ``max_hops`` directed hops."""
    import ray
    import ray.data as rd

    from ..functions.shuffle import hash_partition_map, part_of

    n_parts = cfg.resolved_partitions()
    seeds_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    seeds_ref = ray.put(seeds_arr)

    def _hash_part(x: np.ndarray) -> np.ndarray:
        return part_of(x, n_parts)      # THE repo partition key

    def _tag(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col], dtype=np.int64)
        return pa.table({"src": t[src_col].combine_chunks(),
                         "dst": t[dst_col].combine_chunks(),
                         "part": pa.array(_hash_part(s), pa.int64())})

    def _dedup(tab):
        if tab is None or len(tab) == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        s = np.asarray(tab["src"], dtype=np.int64)
        d = np.asarray(tab["dst"], dtype=np.int64)
        pk = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.table({"src": pa.array(pk[:, 0], pa.int64()),
                         "dst": pa.array(pk[:, 1], pa.int64())})

    tagged = edges_ds.map_batches(_tag, batch_format="pyarrow",
                                  zero_copy_batch=True)
    edge_blocks = list(hash_partition_map(tagged, "part", _dedup, n_parts)
                       .to_arrow_refs())

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

    @ray.remote
    def _init_state(*tabs):
        """sorted distinct nodes; dist 0 at seeds; everything seeded is
        round 0's frontier (changed=1)."""
        tabs = [t for t in tabs if len(t)]
        if not tabs:
            return pa.table({"node": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64()),
                             "changed": pa.array([], pa.int8())})
        nodes = np.unique(np.concatenate(
            [np.asarray(t["node"], dtype=np.int64) for t in tabs]))
        sd = ray.get(seeds_ref)
        dist = np.full(len(nodes), UNREACHED, dtype=np.int64)
        is_seed = np.isin(nodes, sd)
        dist[is_seed] = 0
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "dist": pa.array(dist, pa.int64()),
                         "changed": pa.array(is_seed.astype(np.int8))})

    splits = [_node_splits.remote(b) for b in edge_blocks]
    state_blocks = [_init_state.remote(*[s[p] for s in splits])
                    for p in range(n_parts)]

    @ray.remote
    def _prep_segments(edge_tab):
        """Per-src segment index over the (src-sorted) edge block, so a
        round's compute is proportional to the FRONTIER's out-edges,
        not the whole block (the block itself never changes)."""
        src = np.asarray(edge_tab["src"], dtype=np.int64)
        if not len(src):
            return (src, src, src)
        first = np.ones(len(src), dtype=bool)
        first[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(first)
        usrc = src[starts]
        lens = np.diff(np.append(starts, len(src)))
        return usrc, starts, lens

    seg_refs = [_prep_segments.remote(b) for b in edge_blocks]

    @ray.remote(num_returns=n_parts)
    def _frontier(edge_tab, seg, state_tab):
        """Changed nodes propagate dist+1 along their out-edges; partials
        min-reduced per dst, routed by hash(dst).  Only the frontier's
        segments of the edge block are touched."""
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        ch = np.asarray(state_tab["changed"], dtype=np.int8) == 1
        if not ch.any() or not len(edge_tab):
            return (*[empty] * n_parts,) if n_parts > 1 else empty
        node = np.asarray(state_tab["node"], dtype=np.int64)
        dist = np.asarray(state_tab["dist"], dtype=np.int64)
        dst = np.asarray(edge_tab["dst"], dtype=np.int64)
        usrc, starts, lens = seg
        ch_nodes = node[ch]
        spos = np.searchsorted(usrc, ch_nodes)
        spos = np.clip(spos, 0, max(len(usrc) - 1, 0))
        present = (usrc[spos] == ch_nodes) if len(usrc) else \
            np.zeros(len(ch_nodes), bool)
        sel = spos[present]
        if not len(sel):
            return (*[empty] * n_parts,) if n_parts > 1 else empty
        sel_starts, sel_lens = starts[sel], lens[sel]
        total = int(sel_lens.sum())
        base_rep = np.repeat(np.cumsum(sel_lens) - sel_lens, sel_lens)
        idx = np.repeat(sel_starts, sel_lens) \
            + (np.arange(total, dtype=np.int64) - base_rep)
        cand_dst = dst[idx]
        cand_d = np.repeat(dist[ch][present] + 1, sel_lens)
        ud, inv = np.unique(cand_dst, return_inverse=True)
        best = np.full(len(ud), UNREACHED, dtype=np.int64)
        np.minimum.at(best, inv, cand_d)
        part = _hash_part(ud)
        order = np.argsort(part, kind="stable")
        ud, best, part = ud[order], best[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        outs = [pa.table({"node": pa.array(ud[bounds[p]:bounds[p + 1]],
                                           pa.int64()),
                          "dist": pa.array(best[bounds[p]:bounds[p + 1]],
                                           pa.int64())})
                for p in range(n_parts)]
        return (*outs,) if n_parts > 1 else outs[0]

    @ray.remote(num_returns=2)
    def _min_merge(state_tab, *msg_tabs):
        node = np.asarray(state_tab["node"], dtype=np.int64)
        dist = np.asarray(state_tab["dist"], dtype=np.int64).copy()
        changed = np.zeros(len(node), dtype=np.int8)
        for m in msg_tabs:
            if not len(m):
                continue
            mn = np.asarray(m["node"], dtype=np.int64)
            md = np.asarray(m["dist"], dtype=np.int64)
            pos = np.searchsorted(node, mn)
            better = md < dist[pos]
            dist[pos[better]] = md[better]
            changed[pos[better]] = 1
        return (pa.table({"node": pa.array(node, pa.int64()),
                          "dist": pa.array(dist, pa.int64()),
                          "changed": pa.array(changed)}),
                int(changed.sum()))

    hops = 0
    n_changed = [1]
    while sum(n_changed) > 0 and hops < max_hops:
        msgs = [_frontier.remote(edge_blocks[p], seg_refs[p],
                                 state_blocks[p])
                for p in range(n_parts)]
        merged = [_min_merge.remote(state_blocks[q], *[m[q] for m in msgs])
                  for q in range(n_parts)]
        state_blocks = [m[0] for m in merged]
        n_changed = ray.get([m[1] for m in merged])
        hops += 1

    if counters is not None:
        counters.add.remote({"bfs_hops": hops})

    @ray.remote
    def _emit(state_tab):
        dist = np.asarray(state_tab["dist"], dtype=np.int64)
        keep = pa.array(dist < UNREACHED)
        return pa.table({"node": state_tab.column("node").filter(keep),
                         "dist": state_tab.column("dist").filter(keep)})

    out_refs = [_emit.remote(s) for s in state_blocks]
    ray.wait(out_refs, num_returns=len(out_refs))   # see pagerank._emit note
    return rd.from_arrow_refs(out_refs)
