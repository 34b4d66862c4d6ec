"""Distributed PageRank over a link graph, in EXACT integer fixed-point.

The host-level link graph is the standard companion artifact of a
web-dedup corpus (crawl frontier prioritization, spam-host demotion,
quality-weighted sampling all consume it), and PageRank is the
reference's graph world-view (CSR edge kernels, jaccard.cpp's
row-per-vertex gather) taken one step further: an *iterative* message
exchange over the same partitioned adjacency.

Why integer fixed-point: float PageRank sums are order-dependent, so a
distributed run could never hash-match a SQL oracle.  Ranks here are
int64 in units of ``1/scale`` (default 1e-12) and every operation is
integer (floor) arithmetic — commutative, associative, and expressible
verbatim in DuckDB (``//``), so the K-iteration recursion unrolls into
K chained CTEs and hash-compares exactly (queries.py SQL_PAGERANK).

Semantics (mirrored EXACTLY by the SQL oracle):
  * edges   := distinct (src, dst) of the input (self-loops kept as-is)
  * n       := |{src} ∪ {dst}|
  * outdeg  := distinct out-edge count per node
  * r0[v]   := scale // n
  * each iteration, with num/den the damping fraction (85/100):
      share  := (Σ_{outdeg[u]=0} r[u]) // n          (dangling mass)
      inc[v] := Σ_{u→v} (r[u] // outdeg[u])
      base   := ((scale * (den − num)) // den) // n
      r'[v]  := base + (num * (inc[v] + share)) // den

Physical plan (the cc.py architecture — SURVEY.md §2 custom-operator
rule (c), raw tasks for iterative co-partitioned state):
  * ONE hash exchange partitions edges by hash(src); edge partition p
    is deduped, sorted by src, and NEVER moves again.
  * rank state (node, outdeg, rank) is partitioned by the SAME hash of
    node, so edge partition p reads every src's rank from state
    partition p with one searchsorted — the join without a join.
  * each round = P message tasks (segment-summed per-dst partials,
    routed by hash(dst)) + P apply tasks; the only driver sync is the
    P dangling scalars (the global dangling term is inherently a
    barrier).  Per-round movement = partial-sum rows only, never edges.

Partition-count guidance (measured, ROUND4_NOTES session 3): each round
creates P×(P+1) small objects (every message task returns one shard per
destination partition), so P should track the CORE count, not exceed it
— at 32 CPUs / 20M edges, 5 rounds take ~7.5 s at P=32 but 20-60 s at
P=64, the P² object overhead dominating compute.  On a multi-node
cluster where P must be large, the message shards need a two-level
merge (node-local combine, then cross-node) before _apply — the same
tree shape hll/heavy_hitters already use — rather than P direct
returns; the current flat fan is correct at any P but
scheduler-bound above P ≈ cores.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig

DAMPING_NUM = 85        # damping 0.85 as an exact fraction
DAMPING_DEN = 100
RANK_SCALE = 10 ** 12   # rank unit = 1e-12


def _empty_edges(weighted: bool = False) -> pa.Table:
    cols = {"src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64())}
    if weighted:
        cols["w"] = pa.array([], pa.int64())
    return pa.table(cols)


def _empty_state() -> pa.Table:
    return pa.table({"node": pa.array([], pa.int64()),
                     "outdeg": pa.array([], pa.int64()),
                     "rank_fp": pa.array([], pa.int64())})


# Fan machinery lives in stages/fan.py (shared with hits.py);
# re-exported here for callers that historically imported it from this
# module.
from .fan import FAN_TREE_MIN_PARTS, FanPlan  # noqa: E402


def pagerank(edges_ds, cfg: PipelineConfig, *, n_iter: int = 5,
             damping_num: int = DAMPING_NUM, damping_den: int = DAMPING_DEN,
             scale: int = RANK_SCALE, src_col: str = "src",
             dst_col: str = "dst", weight_col: str | None = None,
             personalization=None, fan: str = "auto",
             node_groups: int | None = None, counters=None):
    """edges(src:int64, dst:int64) → Dataset(node:int64, rank_fp:int64).

    ``rank_fp`` is the PageRank mass in units of ``1/scale``; ranks of
    all nodes sum to ≈ scale (floor-division remainders are dropped,
    identically on both engine and oracle sides).

    ``weight_col``: integer edge weights — duplicate (src,dst) rows sum;
    contribution becomes (rank·w)//W(u) with W(u)=Σ out-weights (exact
    int64; scale·max_weight < 2⁶³ is checked at edge build and
    raises ValueError on overflow).  ``weight_col=
    None`` is the w≡1 special case of the same arithmetic.

    ``personalization``: iterable of seed node ids — teleport mass
    (the (1−d) base AND the dangling share) goes only to seeds present
    in the graph, divided by |S|; uniform PageRank IS the S=V case, so
    both run the same code path.  Initial rank stays scale//n uniform
    (a fixed-iteration convention the oracle mirrors).

    ``fan``: message-shard topology per round — ``"flat"`` (each message
    task returns one shard per destination partition: P² objects/round),
    ``"tree"`` (shards travel via √P partition groups: message tasks
    return G=⌈√P⌉ group shards, G combine tasks pre-sum per node and
    re-split to their group's partitions — O(P^1.5) objects/round),
    ``"nodes"`` (the multi-node shape: partitions are grouped into M
    NODE groups — ``node_groups``, default the live Ray node count, or
    ⌈√P⌉ single-node — and shards take two hops: an M-way first fan
    (one shard per destination node group), an (M_src × M_dst)
    node-LOCAL combine that pre-sums each source node's shards for one
    destination node, then a per-destination-node merge+split.  Only
    the M² level-1 outputs cross the network; the P·M first-fan objects
    and the P final splits stay node-local, pinned there with soft
    NodeAffinity scheduling hints keyed by group — at P=8192/M=64 the
    cross-node object count drops from tree's ~740k/round to 4096), or
    ``"auto"`` (tree when P ≥ FAN_TREE_MIN_PARTS).  Results are
    bit-identical across all fans (integer sums reassociate freely);
    telemetry counters record objects/round per topology."""
    import ray
    import ray.data as rd

    from ..functions.shuffle import hash_partition_map, part_of

    if fan not in ("flat", "tree", "nodes", "auto"):
        raise ValueError(
            f"fan={fan!r} not in {{'flat', 'tree', 'nodes', 'auto'}}")
    n_parts = cfg.resolved_partitions()

    def _hash_part(x: np.ndarray) -> np.ndarray:
        return part_of(x, n_parts)      # THE repo partition key

    weighted = weight_col is not None

    def _tag(t: pa.Table) -> pa.Table:
        src = np.asarray(t[src_col], dtype=np.int64)
        cols = {"src": t[src_col].combine_chunks(),
                "dst": t[dst_col].combine_chunks(),
                "part": pa.array(_hash_part(src), pa.int64())}
        if weighted:
            cols["w"] = pc.cast(t[weight_col].combine_chunks(), pa.int64())
        return pa.table(cols)

    tagged = edges_ds.map_batches(_tag, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def _dedup_sort(tab):
        # distinct (src, dst) [weights of duplicates sum], sorted by
        # src — a (src,dst) pair always hashes to the same partition,
        # so per-partition distinct/sum IS global.
        if tab is None or len(tab) == 0:
            return _empty_edges(weighted)
        src = np.asarray(tab["src"], dtype=np.int64)
        dst = np.asarray(tab["dst"], dtype=np.int64)
        if not weighted:
            pk = np.unique(np.stack([src, dst], axis=1), axis=0)
            return pa.table({"src": pa.array(pk[:, 0], pa.int64()),
                             "dst": pa.array(pk[:, 1], pa.int64())})
        w = np.asarray(tab["w"], dtype=np.int64)
        if (w <= 0).any():
            raise ValueError(
                "pagerank: edge weights must be positive (zero/negative "
                "weights would silently corrupt W(u) and the dangling "
                "classification)")
        pk, inv = np.unique(np.stack([src, dst], axis=1), axis=0,
                            return_inverse=True)
        ws = np.zeros(len(pk), dtype=np.int64)
        np.add.at(ws, inv, w)
        if len(ws) and int(ws.max()) > (2 ** 63 - 1) // scale:
            raise ValueError(
                f"pagerank: summed edge weight {int(ws.max())} overflows "
                f"rank*w at scale={scale} (max {(2**63 - 1) // scale}); "
                f"lower scale= or pre-scale the weights")
        return pa.table({"src": pa.array(pk[:, 0], pa.int64()),
                         "dst": pa.array(pk[:, 1], pa.int64()),
                         "w": pa.array(ws, pa.int64())})

    edge_blocks = hash_partition_map(
        tagged, "part", _dedup_sort, n_parts).to_arrow_refs()

    # ---- initial state: (node, outdeg) co-partitioned by hash(node).
    # srcs of edge partition p already hash to p; dsts are routed.
    @ray.remote(num_returns=n_parts)
    def _node_splits(edge_tab):
        src = np.asarray(edge_tab["src"], dtype=np.int64)
        dst = np.asarray(edge_tab["dst"], dtype=np.int64)
        # per-src out-mass: distinct-edge count, or Σ weights (edge_tab
        # is globally deduped / weight-summed)
        if not weighted:
            usrc, deg = (np.unique(src, return_counts=True) if len(src)
                         else (src, src))
        else:
            usrc, inv = (np.unique(src, return_inverse=True) if len(src)
                         else (src, src))
            deg = np.zeros(len(usrc), dtype=np.int64)
            if len(src):
                np.add.at(deg, inv, np.asarray(edge_tab["w"],
                                               dtype=np.int64))
        nodes = np.unique(np.concatenate([usrc, dst]))
        outdeg = np.zeros(len(nodes), dtype=np.int64)
        pos = np.searchsorted(nodes, usrc)
        outdeg[pos] = deg
        part = _hash_part(nodes)
        order = np.argsort(part, kind="stable")
        nodes, outdeg, part = nodes[order], outdeg[order], part[order]
        bounds = np.searchsorted(part, np.arange(n_parts + 1))
        return tuple(
            pa.table({"node": pa.array(nodes[bounds[p]:bounds[p + 1]],
                                       pa.int64()),
                      "outdeg": pa.array(outdeg[bounds[p]:bounds[p + 1]],
                                         pa.int64())})
            for p in range(n_parts))

    @ray.remote(num_returns=2)
    def _merge_nodes(*tabs):
        """Merge a partition's (node, outdeg) shards: distinct nodes
        sorted, out-degrees max-merged (a src's full degree arrives from
        exactly one shard; other shards contribute it as a dst with 0).
        Second return = node count (for the global n)."""
        tabs = [t for t in tabs if len(t)]
        if not tabs:
            return _empty_state(), 0
        t = pa.concat_tables(tabs)
        node = np.asarray(t["node"], dtype=np.int64)
        deg = np.asarray(t["outdeg"], dtype=np.int64)
        order = np.lexsort((deg, node))
        node, deg = node[order], deg[order]
        last = np.empty(len(node), dtype=bool)      # max deg = last in run
        last[-1] = True
        last[:-1] = node[1:] != node[:-1]
        node, deg = node[last], deg[last]
        return (pa.table({"node": pa.array(node, pa.int64()),
                          "outdeg": pa.array(deg, pa.int64()),
                          "rank_fp": pa.array(np.zeros(len(node), np.int64)),
                          }), len(node))

    splits = [_node_splits.remote(b) for b in edge_blocks]
    merged = [_merge_nodes.remote(*[s[p] for s in splits])
              for p in range(n_parts)]
    state_blocks = [m[0] for m in merged]
    n_nodes = int(sum(ray.get([m[1] for m in merged])))
    if n_nodes == 0:
        return rd.from_arrow([_empty_state().select(["node", "rank_fp"])])

    r0 = scale // n_nodes
    seeds_ref = ray.put(
        np.unique(np.asarray(list(personalization), dtype=np.int64))
        if personalization is not None else None)

    @ray.remote(num_returns=2)
    def _set_rank(state_tab, r):
        n = len(state_tab)
        sd = ray.get(seeds_ref)
        node = np.asarray(state_tab["node"], dtype=np.int64)
        seed = (np.isin(node, sd).astype(np.int8) if sd is not None
                else np.ones(n, dtype=np.int8))
        t = state_tab.set_column(
            2, "rank_fp", pa.array(np.full(n, r, np.int64)))
        return t.append_column("seed", pa.array(seed)), int(seed.sum())

    rs = [_set_rank.remote(s, r0) for s in state_blocks]
    state_blocks = [r_[0] for r_ in rs]
    n_base = int(sum(ray.get([r_[1] for r_ in rs])))   # |S ∩ V|
    if n_base == 0:
        raise ValueError("pagerank: no personalization seed is present "
                         "in the graph")
    base = ((scale * (damping_den - damping_num)) // damping_den) // n_base

    # Fan topology (flat / tree / nodes) — the shared stages/fan.py
    # machinery; "nodes" pins a group's message/combine/apply tasks to
    # one node via soft NodeAffinity so only the M² level-1 combine
    # outputs cross the network (see fan.py's module docstring).
    plan = FanPlan(fan, n_parts, node_groups)

    @ray.remote
    def _prep_edges(edge_tab):
        """Round-invariant routing for this (static) edge block: the
        dst grouping + its part-sorted layout + shard bounds, computed
        ONCE instead of re-sorted every round (was a dominant share of
        per-round compute at 20M edges)."""
        dst = np.asarray(edge_tab["dst"], dtype=np.int64)
        udst, inv = (np.unique(dst, return_inverse=True) if len(dst)
                     else (dst, dst.astype(np.int64)))
        part = _hash_part(udst)
        order = np.argsort(part, kind="stable")
        slot = np.empty(len(udst), dtype=np.int64)
        slot[order] = np.arange(len(udst))
        inv2 = slot[inv] if len(dst) else inv   # edge → final slot
        udst_s, part_s = udst[order], part[order]
        bounds = np.searchsorted(part_s, np.arange(n_parts + 1))
        return udst_s, inv2, part_s, bounds

    prep_refs = [_prep_edges.remote(b) for b in edge_blocks]

    @ray.remote
    def _apply(state_tab, share, *msg_tabs):
        node = np.asarray(state_tab["node"], dtype=np.int64)
        inc = np.zeros(len(node), dtype=np.int64)
        for m in msg_tabs:
            if not len(m):
                continue
            mn = np.asarray(m["node"], dtype=np.int64)
            mi = np.asarray(m["inc"], dtype=np.int64)
            pos = np.searchsorted(node, mn)
            inc[pos] += mi                    # every dst exists in state
        seed = np.asarray(state_tab["seed"],
                          dtype=np.int8).astype(np.int64)
        new_rank = seed * base \
            + (damping_num * (inc + seed * share)) // damping_den
        return state_tab.set_column(2, "rank_fp",
                                    pa.array(new_rank, pa.int64()))

    @ray.remote
    def _messages_chunked(edge_tab, prep, state_tab, chunk, n_chunks):
        """Edge partition p + state partition p → (node, inc, part)
        partial-sum shards grouped by destination partition CHUNK
        (part // chunk) — n_chunks returns plus the partition's
        dangling rank mass (Σ rank where outdeg==0).  Called with
        .options(num_returns=n_chunks + 1); chunk=1 is the flat fan,
        chunk=⌈√P⌉ the tree fan, chunk=P/M the nodes fan (fan.py)."""
        node = np.asarray(state_tab["node"], dtype=np.int64)
        deg = np.asarray(state_tab["outdeg"], dtype=np.int64)
        rank = np.asarray(state_tab["rank_fp"], dtype=np.int64)
        dang = int(rank[deg == 0].sum())
        src = np.asarray(edge_tab["src"], dtype=np.int64)
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "inc": pa.array([], pa.int64()),
                          "part": pa.array([], pa.int64())})
        if not len(src):
            return (*[empty] * n_chunks, dang)
        udst_s, inv2, part_s, _b = prep
        cbounds = np.searchsorted(part_s,
                                  np.arange(n_chunks + 1) * chunk)
        pos = np.searchsorted(node, src)
        if weighted:
            contrib = (rank[pos]
                       * np.asarray(edge_tab["w"], dtype=np.int64)) \
                // deg[pos]
        else:
            contrib = rank[pos] // deg[pos]
        inc = np.zeros(len(udst_s), dtype=np.int64)
        np.add.at(inc, inv2, contrib)
        outs = [pa.table({"node": pa.array(udst_s[cbounds[g]:cbounds[g + 1]],
                                           pa.int64()),
                          "inc": pa.array(inc[cbounds[g]:cbounds[g + 1]],
                                          pa.int64()),
                          "part": pa.array(part_s[cbounds[g]:cbounds[g + 1]],
                                           pa.int64())})
                for g in range(n_chunks)]
        return (*outs, dang)

    def _apply_opts(q: int) -> dict:
        return plan.aff(q // plan.ppn) if plan.mode == "nodes" else {}

    for _ in range(n_iter):
        msg = [_messages_chunked.options(**plan.msg_options(p, 1))
               .remote(edge_blocks[p], prep_refs[p], state_blocks[p],
                       plan.chunk, plan.n_chunks)
               for p in range(n_parts)]
        dang_total = sum(ray.get([m[plan.n_chunks] for m in msg]))
        share = dang_total // n_base
        routed = plan.combine([m[:plan.n_chunks] for m in msg])
        state_blocks = [_apply.options(**_apply_opts(q)).remote(
            state_blocks[q], share, *routed[q])
            for q in range(n_parts)]

    if counters is not None:
        # objects-per-round telemetry: total transient objects the fan
        # creates, and how many of them must cross the network on a
        # multi-node cluster (the nodes fan's whole point)
        counters.add.remote({"pagerank_rounds": n_iter,
                             "pagerank_nodes": n_nodes,
                             f"pagerank_fan_{plan.mode}": 1,
                             "pagerank_msg_objects_per_round":
                                 plan.msg_objects,
                             "pagerank_crossnode_objects_per_round":
                                 plan.crossnode_objects})

    @ray.remote
    def _emit(state_tab):
        return state_tab.select(["node", "rank_fp"])

    out_refs = [_emit.remote(s) for s in state_blocks]
    # Synchronize before handing refs to a Dataset: the caller may drop
    # the Dataset while upstream rounds still have in-flight tasks, and
    # Ray's cancel-vs-complete race on those tasks can crash the core
    # worker (observed: task_manager.cc Check failed ... not pending).
    ray.wait(out_refs, num_returns=len(out_refs))
    return rd.from_arrow_refs(out_refs)
