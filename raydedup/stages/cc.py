"""Connected components over the verified dup-pair graph.

Iterative hash-min label propagation (the standard map-reduce CC): every
node starts labeled with its own id; each round every node takes the min
label over itself and its neighbors (``groupby(node).min(label)``, one
shuffle per round, SURVEY.md §4.2) and then POINTER-JUMPS
(label(v) ← label(label(v)), one extra exchange) — neighbor propagation
alone needs O(diameter) rounds and a pathological chain would exhaust
the iteration cap, while label doubling converges every component in
O(log diameter) rounds.  Bounded by ``cfg.cc_max_iters``.  Each round's label table can be checkpointed
(pipelines/checkpoint.py) so a resumed job restarts from the last round.

The final label of every node is the minimum doc_id in its component —
which makes the SQL oracle for exact-dup components simply
``min(doc_id) OVER (PARTITION BY text)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig


def _symmetrize_pairs(pairs_ds):
    """(a,b) → (node, nbr) both directions."""
    fwd = pairs_ds.map_batches(
        lambda t: pa.table({"node": t["a"], "nbr": t["b"]}),
        batch_format="pyarrow",
    )
    rev = pairs_ds.map_batches(
        lambda t: pa.table({"node": t["b"], "nbr": t["a"]}),
        batch_format="pyarrow",
    )
    return fwd.union(rev)


LOCAL_CC_MAX_EDGES = 5_000_000


def connected_components(pairs_ds, cfg: PipelineConfig, checkpoint_fn=None,
                         mode: str = "auto", counters=None):
    """Dataset(a:int64, b:int64) of undirected edges →
    Dataset(node:int64, component:int64) for every node that appears in
    an edge; component = min doc_id of the component.

    ``mode``: "distributed" = iterative hash-min label propagation
    (shuffle per round — the 10^12-doc path); "local" = driver-side
    union-find (right when the verified dup-pair graph is a small
    fraction of the corpus, the common case); "auto" picks by edge
    count (≤ LOCAL_CC_MAX_EDGES → local).

    ``checkpoint_fn(round_idx, labels_ds) -> labels_ds`` is called each
    round when given (hook for Parquet checkpointing).
    """
    if mode == "auto":
        mode = "local" if pairs_ds.count() <= LOCAL_CC_MAX_EDGES else "distributed"
    if mode == "local":
        if counters is not None:
            counters.add.remote({"cc_rounds": 1, "cc_converged": 1})
        return _connected_components_local(pairs_ds)
    return _connected_components_distributed(pairs_ds, cfg, checkpoint_fn,
                                             counters=counters)


def label_components_arrays(a: np.ndarray, b: np.ndarray):
    """Vectorized min-hook + full-compress CONTRACTION over in-memory
    edge arrays → (nodes, component_label) with label = min node id of
    the component.  Each round: compress parent pointers to roots,
    contract edges to root space (dropping intra-component and
    duplicate edges), then hook every larger root to the smallest
    adjacent root (segmented min via reduceat).  Roots at least halve
    per round and the edge set shrinks with them — O(E·log V) worst
    case with geometrically decreasing work, where the previous one-hop
    label propagation was O(E·diameter): a salted LSH flood chain
    (diameter ~L/chunk) took 4 077 rounds / ~13 driver-minutes at 300k
    members; this converges in ~20 rounds / <2 s.  Shared by the local
    CC path and the per-cluster labeling in stages/semdedup.py."""
    # compact ids: np.unique sorts, so the min compacted index of a
    # component is also its min original node id — and min-hooking
    # (larger root points to smaller) makes every final root the
    # component's min compacted id.
    allv = np.concatenate([a, b])
    nodes = np.unique(allv)
    inv = np.searchsorted(nodes, allv)    # ~3x faster than return_inverse
    eu, ev = inv[: len(a)], inv[len(a):]
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        # full path compression (parents only ever decrease, so the
        # pointer forest is acyclic and this terminates in log rounds)
        while True:
            p2 = parent[parent]
            if np.array_equal(p2, parent):
                break
            parent = p2
        if len(eu) == 0:
            break
        ru, rv = parent[eu], parent[ev]
        cross = ru != rv
        if not cross.any():
            break
        ru, rv = ru[cross], rv[cross]
        lo = np.minimum(ru, rv)
        hi = np.maximum(ru, rv)
        # contract: dedup edges in root space before the segmented min
        key = hi << np.int64(32) | lo     # compacted ids < 2^31
        order = np.argsort(key, kind="stable")
        ks = key[order]
        keep = np.concatenate([[True], ks[1:] != ks[:-1]])
        sel = order[keep]
        lo, hi = lo[sel], hi[sel]
        eu, ev = lo, hi                    # next round works on contracted edges
        # min-hook: every hi root points to its smallest adjacent lo
        hs = np.argsort(hi, kind="stable")
        hi_s, lo_s = hi[hs], lo[hs]
        starts = np.flatnonzero(
            np.concatenate([[True], hi_s[1:] != hi_s[:-1]]))
        parent[hi_s[starts]] = np.minimum(
            parent[hi_s[starts]], np.minimum.reduceat(lo_s, starts))
    return nodes, nodes[parent]


def _connected_components_local(pairs_ds):
    """Collected-pair-list CC via :func:`label_components_arrays` (the
    earlier per-edge Python union-find cost tens of driver-seconds at
    the 5M-edge gate).  Only reached when the edge list is provably
    small (auto threshold)."""
    import pandas as pd
    import ray.data as rd

    df = pairs_ds.select_columns(["a", "b"]).to_pandas()
    a = df["a"].to_numpy(dtype=np.int64, copy=False)
    b = df["b"].to_numpy(dtype=np.int64, copy=False)
    nodes, comp = label_components_arrays(a, b)
    out = pd.DataFrame({"node": nodes, "component": comp})
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def _connected_components_distributed(pairs_ds, cfg: PipelineConfig,
                                      checkpoint_fn=None, counters=None):
    """Hash-min label propagation over raw Ray tasks.

    Physical layout: edges are hash-partitioned ONCE by hash(nbr) % P
    and never move again; labels are partitioned by the SAME hash of
    node, so edge partition p can look up every neighbor's label in
    label partition p (co-partitioned, searchsorted per round — the
    join without a join).  Each round is P message tasks (each
    re-splitting its (node, cand) output by hash(node)) + P merge
    tasks; per-round data movement = the label/message rows only.
    """
    import ray
    import ray.data as rd
    import numpy as np

    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()

    def _hash_part(x: np.ndarray) -> np.ndarray:
        return (splitmix64(x.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)

    def _tag(t: pa.Table) -> pa.Table:
        nbr = np.asarray(t["nbr"], dtype=np.int64)
        return t.append_column("part", pa.array(_hash_part(nbr), pa.int64()))

    sym = _symmetrize_pairs(pairs_ds).map_batches(_tag, batch_format="pyarrow")

    def _dedup_edges(tab):
        if tab is None or len(tab) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64())})
        node = np.asarray(tab["node"], dtype=np.int64)
        nbr = np.asarray(tab["nbr"], dtype=np.int64)
        pk = np.unique(np.stack([nbr, node], axis=1), axis=0)  # sort by nbr!
        return pa.table({"node": pa.array(pk[:, 1], pa.int64()),
                         "nbr": pa.array(pk[:, 0], pa.int64())})

    edge_ds = hash_partition_map(sym, "part", _dedup_edges, n_parts)
    edge_blocks = edge_ds.to_arrow_refs()   # static: never reshuffled

    # initial labels: every node labels itself; co-partition by hash(node)
    @ray.remote(num_returns=n_parts)
    def _init_labels(edge_tab):
        node = np.asarray(edge_tab["node"], dtype=np.int64)
        nbr = np.asarray(edge_tab["nbr"], dtype=np.int64)
        nodes = np.unique(np.concatenate([node, nbr]))
        part = _hash_part(nodes)
        order = np.argsort(part, kind="stable")
        nodes, part = nodes[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        return tuple(
            pa.table({"node": pa.array(nodes[bounds[p]:bounds[p + 1]], pa.int64()),
                      "component": pa.array(nodes[bounds[p]:bounds[p + 1]], pa.int64())})
            for p in range(n_parts))

    @ray.remote
    def _merge_label_parts(*tabs):
        tabs = [t for t in tabs if len(t)]
        if not tabs:
            return pa.table({"node": pa.array([], pa.int64()),
                             "component": pa.array([], pa.int64())})
        tab = pa.concat_tables(tabs)
        node = np.asarray(tab["node"], dtype=np.int64)
        comp = np.asarray(tab["component"], dtype=np.int64)
        order = np.lexsort((comp, node))
        node, comp = node[order], comp[order]
        first = np.empty(len(node), dtype=bool)
        first[0] = True
        first[1:] = node[1:] != node[:-1]
        return pa.table({"node": pa.array(node[first], pa.int64()),
                         "component": pa.array(comp[first], pa.int64())})

    init_splits = [_init_labels.remote(b) for b in edge_blocks]
    label_blocks = [_merge_label_parts.remote(*[s[p] for s in init_splits])
                    for p in range(n_parts)]

    @ray.remote(num_returns=n_parts + 1)
    def _messages(edge_tab, label_tab):
        """Edge partition p + label partition p → per-destination-partition
        (node, cand) messages; last return = label lookup table size (unused
        marker kept for arity)."""
        node = np.asarray(edge_tab["node"], dtype=np.int64)
        nbr = np.asarray(edge_tab["nbr"], dtype=np.int64)
        lnode = np.asarray(label_tab["node"], dtype=np.int64)
        lcomp = np.asarray(label_tab["component"], dtype=np.int64)
        # label_tab sorted by node (merge keeps sorted); lookup nbr's label
        pos = np.searchsorted(lnode, nbr)
        pos = np.clip(pos, 0, max(len(lnode) - 1, 0))
        ok = lnode[pos] == nbr if len(lnode) else np.zeros(len(nbr), bool)
        cand = lcomp[pos[ok]]
        dst = node[ok]
        part = _hash_part(dst)
        order = np.argsort(part, kind="stable")
        dst, cand, part = dst[order], cand[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        outs = [pa.table({"node": pa.array(dst[bounds[p]:bounds[p + 1]], pa.int64()),
                          "component": pa.array(cand[bounds[p]:bounds[p + 1]], pa.int64())})
                for p in range(n_parts)]
        return (*outs, len(cand))

    @ray.remote(num_returns=n_parts)
    def _jump_request(label_tab):
        """Pointer-jumping phase 1: route every (node, label) row to the
        partition owning hash(label), so label(label(v)) can be looked
        up there."""
        node = np.asarray(label_tab["node"], dtype=np.int64)
        comp = np.asarray(label_tab["component"], dtype=np.int64)
        part = _hash_part(comp)
        order = np.argsort(part, kind="stable")
        node, comp, part = node[order], comp[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        return tuple(
            pa.table({"node": pa.array(node[bounds[p]:bounds[p + 1]], pa.int64()),
                      "component": pa.array(comp[bounds[p]:bounds[p + 1]], pa.int64())})
            for p in range(n_parts))

    @ray.remote(num_returns=n_parts)
    def _jump_lookup(label_tab, *req_tabs):
        """Phase 2: answer label(label(v)) from this partition's label
        table (every label value is a node id, so its entry lives here by
        the hash invariant), route answers back to hash(node)."""
        reqs = [t for t in req_tabs if len(t)]
        empty = tuple(pa.table({"node": pa.array([], pa.int64()),
                                "component": pa.array([], pa.int64())})
                      for _ in range(n_parts))
        if not reqs:
            return empty
        req = pa.concat_tables(reqs)
        node = np.asarray(req["node"], dtype=np.int64)
        comp = np.asarray(req["component"], dtype=np.int64)
        lnode = np.asarray(label_tab["node"], dtype=np.int64)
        lcomp = np.asarray(label_tab["component"], dtype=np.int64)
        pos = np.searchsorted(lnode, comp)
        pos = np.clip(pos, 0, max(len(lnode) - 1, 0))
        ok = lnode[pos] == comp if len(lnode) else np.zeros(len(comp), bool)
        comp2 = np.where(ok, lcomp[pos] if len(lcomp) else 0, comp)
        part = _hash_part(node)
        order = np.argsort(part, kind="stable")
        node, comp2, part = node[order], comp2[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        return tuple(
            pa.table({"node": pa.array(node[bounds[p]:bounds[p + 1]], pa.int64()),
                      "component": pa.array(comp2[bounds[p]:bounds[p + 1]], pa.int64())})
            for p in range(n_parts))

    @ray.remote(num_returns=2)
    def _merge_round(old_labels, *msg_tabs):
        tabs = [t for t in msg_tabs if len(t)]
        onode = np.asarray(old_labels["node"], dtype=np.int64)
        ocomp = np.asarray(old_labels["component"], dtype=np.int64)
        if not tabs:
            return old_labels, 0
        m = pa.concat_tables(tabs)
        node = np.concatenate([onode, np.asarray(m["node"], np.int64)])
        comp = np.concatenate([ocomp, np.asarray(m["component"], np.int64)])
        order = np.lexsort((comp, node))
        node, comp = node[order], comp[order]
        first = np.empty(len(node), dtype=bool)
        first[0] = True
        first[1:] = node[1:] != node[:-1]
        nnode, ncomp = node[first], comp[first]
        # old_labels covers every node, sorted; so nnode == onode
        changed = int((ncomp != ocomp).sum())
        return (pa.table({"node": pa.array(nnode, pa.int64()),
                          "component": pa.array(ncomp, pa.int64())}),
                changed)

    def _repartition_labels(labels_ds):
        """Restore the co-partitioning invariant (P blocks, block p holds
        exactly the nodes with hash(node)%P == p, sorted by node) after an
        arbitrary checkpoint_fn round-trip (e.g. Parquet write/re-read
        changes block count and order)."""
        def _tag_labels(t: pa.Table) -> pa.Table:
            node = np.asarray(t["node"], dtype=np.int64)
            return pa.table({"node": t["node"], "component": t["component"],
                             "part": pa.array(_hash_part(node), pa.int64())})

        def _sort_part(tab):
            if tab is None or len(tab) == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "component": pa.array([], pa.int64())})
            node = np.asarray(tab["node"], dtype=np.int64)
            comp = np.asarray(tab["component"], dtype=np.int64)
            order = np.argsort(node, kind="stable")
            return pa.table({"node": pa.array(node[order], pa.int64()),
                             "component": pa.array(comp[order], pa.int64())})

        tagged = labels_ds.map_batches(_tag_labels, batch_format="pyarrow")
        return hash_partition_map(tagged, "part", _sort_part, n_parts)

    changed = 0
    it = -1
    for it in range(cfg.cc_max_iters):
        msg_splits = [_messages.remote(edge_blocks[p], label_blocks[p])
                      for p in range(n_parts)]
        results = [_merge_round.remote(
                       label_blocks[q], *[ms[q] for ms in msg_splits])
                   for q in range(n_parts)]
        label_blocks = [r[0] for r in results]
        changed = sum(ray.get([r[1] for r in results]))
        # pointer jumping (label doubling): label(v) <- label(label(v)).
        # Neighbor propagation alone needs O(diameter) rounds — a
        # pathological chain would exhaust cc_max_iters; with doubling
        # every component converges in O(log diameter) rounds.
        jreq = [_jump_request.remote(label_blocks[p]) for p in range(n_parts)]
        jans = [_jump_lookup.remote(label_blocks[p], *[r[p] for r in jreq])
                for p in range(n_parts)]
        jres = [_merge_round.remote(label_blocks[q], *[a[q] for a in jans])
                for q in range(n_parts)]
        label_blocks = [r[0] for r in jres]
        changed += sum(ray.get([r[1] for r in jres]))
        if checkpoint_fn is not None:
            labels_ds = rd.from_arrow_refs(list(label_blocks))
            labels_ds = checkpoint_fn(it, labels_ds)
            # checkpoint_fn may return a dataset with any block layout;
            # re-establish co-partitioning with the static edge blocks
            # before the next round's searchsorted label lookups.
            label_blocks = _repartition_labels(labels_ds).to_arrow_refs()
            if len(label_blocks) != n_parts:
                raise RuntimeError(
                    f"label repartition produced {len(label_blocks)} blocks, "
                    f"expected {n_parts}")
        if changed == 0:
            break
    if counters is not None:
        counters.add.remote({"cc_rounds": it + 1,
                             "cc_converged": int(changed == 0)})
    if changed != 0:
        import warnings
        warnings.warn(
            f"connected_components: hash-min did not converge within "
            f"cc_max_iters={cfg.cc_max_iters} rounds ({changed} labels still "
            f"changing) — returned labels may split long-chain components; "
            f"raise cfg.cc_max_iters", RuntimeWarning)
    return rd.from_arrow_refs(list(label_blocks))


def cluster_size_histogram(labels_ds, cfg: PipelineConfig, *,
                           label_col: str = "component"):
    """→ Dataset(cluster_size, n_clusters): how many clusters have each
    member count — the dedup-report summary every corpus build prints
    (how much of the corpus sits in 2-member vs 10k-member clusters).

    Scale shape: label rows (already ≪ corpus) are exchanged ONCE by
    hash(component) so each component's rows land in one partition;
    per-partition sizes reduce to a partial (size → count) histogram —
    the only rows that leave a partition are histogram entries, bounded
    by the distinct cluster sizes present.  A final single-reduce sums
    partials (tiny by construction)."""
    from ..functions.hashing import splitmix64
    from ..functions.shuffle import hash_partition_map

    n_parts = cfg.resolved_partitions()

    def _tag(t: pa.Table) -> pa.Table:
        lab = np.asarray(t[label_col], dtype=np.int64)
        part = (splitmix64(lab.view(np.uint64))
                % np.uint64(n_parts)).astype(np.int64)
        return pa.table({label_col: t[label_col],
                         "part": pa.array(part, pa.int64())})

    empty = pa.table({"cluster_size": pa.array([], pa.int64()),
                      "n_clusters": pa.array([], pa.int64())})

    def _partial(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        lab = np.asarray(tab[label_col], dtype=np.int64)
        _, sizes = np.unique(lab, return_counts=True)
        sz, cnt = np.unique(sizes, return_counts=True)
        return pa.table({"cluster_size": pa.array(sz, pa.int64()),
                         "n_clusters": pa.array(cnt, pa.int64())})

    partials = hash_partition_map(
        labels_ds.map_batches(_tag, batch_format="pyarrow",
                              zero_copy_batch=True),
        "part", _partial, n_parts)

    def _zero(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in t.column_names}
        out["part"] = pa.array(np.zeros(len(t), np.int64), pa.int64())
        return pa.table(out)

    def _final(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return empty
        sz = np.asarray(tab["cluster_size"], dtype=np.int64)
        cnt = np.asarray(tab["n_clusters"], dtype=np.int64)
        u, inv = np.unique(sz, return_inverse=True)
        tot = np.bincount(inv, weights=cnt).astype(np.int64)
        return pa.table({"cluster_size": pa.array(u, pa.int64()),
                         "n_clusters": pa.array(tot, pa.int64())})

    return hash_partition_map(
        partials.map_batches(_zero, batch_format="pyarrow",
                             zero_copy_batch=True),
        "part", _final, 1)
