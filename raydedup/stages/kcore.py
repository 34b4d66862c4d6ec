"""Distributed k-core decomposition by iterative peeling.

The k-core is the maximal subgraph in which every node has degree ≥ k —
the standard dense-substructure filter for a web host graph (link-farm
and spam-cluster mining use high-k cores; frontier pruning drops the
1-core fringe).  Reference analogue: the same CSR adjacency world-view
as jaccard.cpp's row-per-vertex kernels, but with per-round mutation.

Physical plan (cc.py's co-partitioned layout, with per-round edge-block
shrinkage):
  * symmetrized edge rows (node, nbr) are hash-partitioned ONCE by
    hash(nbr) — partition p holds every row whose NEIGHBOR lives in p,
    sorted by nbr;
  * degree state (node, deg, alive) is partitioned by hash(node), so
    partition p's dead list is exactly the set of nbr values that
    partition p's edge block must fire decrements for;
  * each round = P peel tasks (edge partition p + freshly-dead list p →
    per-owner decrement partials routed by hash(node), PLUS the edge
    block with fired rows deleted — blocks only ever shrink) + P apply
    tasks; driver sync is one P-int "newly dead count" per round.
  * termination when no node died this round; output = alive nodes.

Rounds are O(peeling depth); per-round traffic is decrement partials
only, never edges.  Not SQL-expressible (iterated aggregation) — the
driver records a rows-only check and correctness is pinned against a
pure-python reference in tests/test_kcore.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import PipelineConfig


def k_core(edges_ds, cfg: PipelineConfig, k: int, *,
           src_col: str = "src", dst_col: str = "dst",
           max_rounds: int = 10_000, counters=None,
           strict: bool = False, return_trace: bool = False):
    """edges(src,dst) (directionless; dupes/self-loops dropped) →
    Dataset(node:int64) — the members of the k-core.

    ``strict=True``: raise ``RuntimeError`` on ``max_rounds``
    exhaustion instead of warning — without it a pipeline consuming the
    returned Dataset has no in-band signal that the result is a
    SUPERSET of the true k-core (ADVICE r4).

    ``return_trace=True``: also return the per-round peel trace as a
    list of newly-dead node counts (``trace[0]`` = nodes below ``k``
    initially, ``trace[i]`` = nodes peeled in round ``i``) — the
    driver-checkable leg of an otherwise rows-only iterated
    aggregation: the first R entries unroll into SQL (see
    queries.SQL_K_CORE_TRACE)."""
    import ray
    import ray.data as rd

    from ..functions.shuffle import hash_partition_map, part_of

    n_parts = cfg.resolved_partitions()

    def _hash_part(x: np.ndarray) -> np.ndarray:
        return part_of(x, n_parts)      # THE repo partition key

    def _tag(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col], dtype=np.int64)
        d = np.asarray(t[dst_col], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        node = np.concatenate([s, d])
        nbr = np.concatenate([d, s])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "nbr": pa.array(nbr, pa.int64()),
                         "part": pa.array(_hash_part(nbr), pa.int64())})

    def _dedup(tab):
        if tab is None or len(tab) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64())})
        node = np.asarray(tab["node"], dtype=np.int64)
        nbr = np.asarray(tab["nbr"], dtype=np.int64)
        pk = np.unique(np.stack([nbr, node], axis=1), axis=0)  # sort by nbr
        return pa.table({"node": pa.array(pk[:, 1], pa.int64()),
                         "nbr": pa.array(pk[:, 0], pa.int64())})

    tagged = edges_ds.map_batches(_tag, batch_format="pyarrow",
                                  zero_copy_batch=True)
    edge_blocks = list(hash_partition_map(tagged, "part", _dedup, n_parts)
                       .to_arrow_refs())

    # ---- initial state: (node, deg) by hash(node).  Each edge block
    # contributes degree partials keyed by its *node* column.
    @ray.remote(num_returns=n_parts)
    def _deg_splits(edge_tab):
        node = np.asarray(edge_tab["node"], dtype=np.int64)
        un, cnt = (np.unique(node, return_counts=True) if len(node)
                   else (node, node))
        part = _hash_part(un)
        order = np.argsort(part, kind="stable")
        un, cnt, part = un[order], cnt[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        return tuple(
            pa.table({"node": pa.array(un[bounds[p]:bounds[p + 1]],
                                       pa.int64()),
                      "deg": pa.array(cnt[bounds[p]:bounds[p + 1]]
                                      .astype(np.int64))})
            for p in range(n_parts))

    @ray.remote(num_returns=2)
    def _merge_deg(*tabs):
        """→ (state table sorted by node, count of initially-dead).
        alive=1 for deg ≥ k; nodes below k are dead immediately and form
        round 0's dead list."""
        tabs = [t for t in tabs if len(t)]
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64()),
                          "alive": pa.array([], pa.int8())})
        if not tabs:
            return empty, 0
        t = pa.concat_tables(tabs)
        node = np.asarray(t["node"], dtype=np.int64)
        deg = np.asarray(t["deg"], dtype=np.int64)
        order = np.argsort(node, kind="stable")
        node, deg = node[order], deg[order]
        # partials for one node arrive from several edge blocks
        first = np.ones(len(node), dtype=bool)
        first[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(first)
        deg = np.add.reduceat(deg, starts) if len(starts) else deg
        node = node[starts]
        alive = (deg >= k).astype(np.int8)
        return (pa.table({"node": pa.array(node, pa.int64()),
                          "deg": pa.array(deg, pa.int64()),
                          "alive": pa.array(alive)}),
                int((alive == 0).sum()))

    splits = [_deg_splits.remote(b) for b in edge_blocks]
    merged = [_merge_deg.remote(*[s[p] for s in splits])
              for p in range(n_parts)]
    state_blocks = [m[0] for m in merged]
    n_dead = ray.get([m[1] for m in merged])

    @ray.remote
    def _fresh_dead(state_tab):
        """Nodes that died since last peel (alive==0 marker is flipped
        to -1 once their death has been broadcast)."""
        alive = np.asarray(state_tab["alive"], dtype=np.int8)
        return pa.table({"dead": state_tab.column("node").filter(
            pa.array(alive == 0))})

    @ray.remote(num_returns=n_parts + 1)
    def _peel(edge_tab, dead_tab):
        """Fire decrements for rows whose nbr just died; return the
        shrunken edge block as the extra slot."""
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "dec": pa.array([], pa.int64())})
        node = np.asarray(edge_tab["node"], dtype=np.int64)
        nbr = np.asarray(edge_tab["nbr"], dtype=np.int64)
        dead = np.asarray(dead_tab["dead"], dtype=np.int64)
        if not len(dead) or not len(nbr):
            return (*[empty] * n_parts, edge_tab)
        hit = np.isin(nbr, dead)          # dead is small per round
        tgt = node[hit]
        un, cnt = np.unique(tgt, return_counts=True)
        part = _hash_part(un)
        order = np.argsort(part, kind="stable")
        un, cnt, part = un[order], cnt[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        outs = [pa.table({"node": pa.array(un[bounds[p]:bounds[p + 1]],
                                           pa.int64()),
                          "dec": pa.array(cnt[bounds[p]:bounds[p + 1]]
                                          .astype(np.int64))})
                for p in range(n_parts)]
        keep = pa.array(~hit)
        return (*outs, edge_tab.filter(keep))

    @ray.remote(num_returns=2)
    def _apply(state_tab, *dec_tabs):
        node = np.asarray(state_tab["node"], dtype=np.int64)
        deg = np.asarray(state_tab["deg"], dtype=np.int64).copy()
        alive = np.asarray(state_tab["alive"], dtype=np.int8).copy()
        alive[alive == 0] = -1            # death now broadcast
        for m in dec_tabs:
            if not len(m):
                continue
            mn = np.asarray(m["node"], dtype=np.int64)
            md = np.asarray(m["dec"], dtype=np.int64)
            pos = np.searchsorted(node, mn)
            deg[pos] -= md
        newly = (alive == 1) & (deg < k)
        alive[newly] = 0
        return (pa.table({"node": pa.array(node, pa.int64()),
                          "deg": pa.array(deg, pa.int64()),
                          "alive": pa.array(alive)}),
                int(newly.sum()))

    rounds = 0
    trace = [int(sum(n_dead))]          # round 0: initially below k
    while sum(n_dead) > 0 and rounds < max_rounds:
        dead = [_fresh_dead.remote(s) for s in state_blocks]
        peeled = [_peel.remote(edge_blocks[p], dead[p])
                  for p in range(n_parts)]
        edge_blocks = [p_[n_parts] for p_ in peeled]
        applied = [_apply.remote(state_blocks[q], *[p_[q] for p_ in peeled])
                   for q in range(n_parts)]
        state_blocks = [a[0] for a in applied]
        n_dead = ray.get([a[1] for a in applied])
        trace.append(int(sum(n_dead)))
        rounds += 1

    if sum(n_dead) > 0:
        msg = (f"k_core: peeling did not converge within max_rounds="
               f"{max_rounds} ({sum(n_dead)} nodes still dying) — the "
               f"returned set is a SUPERSET of the true {k}-core; raise "
               f"max_rounds")
        if strict:
            raise RuntimeError(msg)
        import warnings
        warnings.warn(msg, RuntimeWarning)
    if counters is not None:
        counters.add.remote({"kcore_rounds": rounds,
                             "kcore_converged": int(sum(n_dead) == 0)})

    @ray.remote
    def _alive(state_tab):
        alive = np.asarray(state_tab["alive"], dtype=np.int8)
        return pa.table({"node": state_tab.column("node").filter(
            pa.array(alive == 1))})

    out_refs = [_alive.remote(s) for s in state_blocks]
    ray.wait(out_refs, num_returns=len(out_refs))   # see pagerank._emit note
    out = rd.from_arrow_refs(out_refs)
    return (out, trace) if return_trace else out
