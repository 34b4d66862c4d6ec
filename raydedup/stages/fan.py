"""Message-fan topologies for the iterative graph stages.

The per-round exchange of pagerank/HITS-style algorithms is P message
tasks, each holding partial (node, inc) sums destined for every state
partition.  How those shards travel to the P apply/merge tasks is the
*fan*:

  * ``flat``  — every message task returns one shard per destination
    partition: P² transient objects per round, all of which cross the
    network on a multi-node cluster.
  * ``tree``  — shards are grouped into G = ⌈√P⌉ partition groups;
    G combine tasks pre-sum per node and re-split: O(P·√P) objects.
  * ``nodes`` — the multi-node shape: partitions group into M NODE
    groups (the live Ray node count at cluster scale; ⌈√P⌉ emulated
    single-node).  Shards take two hops — an M-way first fan, an
    (M_src × M_dst) node-LOCAL combine that pre-sums each source
    node's shards for one destination node, then a per-destination
    merge+split.  Soft NodeAffinity hints pin level-1 work to the
    source node, so only the M² level-1 outputs cross the network
    (P=8192, M=64: ~4096 cross-node objects vs tree's ~740k).

All fans are bit-identical: the combines only reassociate integer
sums.  This module hosts the topology-generic pieces — shard schema,
the per-(part, node) pre-sum kernel, the two combine task types, fan
resolution and affinity hints — shared by stages/pagerank.py (where
the design originated; probe docs/fan_probe_r5.json) and
stages/hits.py.

Shard contract: every message-task shard is a table with columns
``node:int64, inc:int64, part:int64`` (part = destination partition),
grouped by destination CHUNK of ``chunk`` consecutive partitions —
``n_chunks`` shards per message task.  Flat is the chunk=1 special
case (each shard holds exactly one partition's rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

FAN_TREE_MIN_PARTS = 48   # flat P² object fan is fine below this

EMPTY_MSG = pa.table({"node": pa.array([], pa.int64()),
                      "inc": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})


def presum(shards):
    """Concat shards and pre-sum ``inc`` per (part, node) — the shared
    kernel of both combine levels."""
    t = pa.concat_tables([s.select(["node", "inc", "part"])
                          for s in shards])
    node = np.asarray(t["node"], dtype=np.int64)
    inc = np.asarray(t["inc"], dtype=np.int64)
    part = np.asarray(t["part"], dtype=np.int64)
    order = np.lexsort((node, part))
    node, inc, part = node[order], inc[order], part[order]
    first = np.ones(len(node), dtype=bool)
    first[1:] = (node[1:] != node[:-1]) | (part[1:] != part[:-1])
    starts = np.flatnonzero(first)
    return node[starts], np.add.reduceat(inc, starts), part[starts]


@ray.remote
def combine_local(*shards):
    """Level-1 combine of the nodes fan: pre-sum ONE source node
    group's shards destined to one destination node group.  On a real
    cluster this runs on the SOURCE node (affinity hint), so its
    inputs never cross the network — its single output is the only
    cross-node object."""
    shards = [s for s in shards if len(s)]
    if not shards:
        return EMPTY_MSG
    node, summed, part = presum(shards)
    return pa.table({"node": pa.array(node, pa.int64()),
                     "inc": pa.array(summed, pa.int64()),
                     "part": pa.array(part, pa.int64())})


@ray.remote
def combine_group(g0, gsize, *shards):
    """Merge one destination group's shards: pre-sum per node, then
    re-split into the group's partitions [g0, g0+gsize).  Called with
    ``.options(num_returns=gsize)``."""
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "inc": pa.array([], pa.int64())})
    shards = [s for s in shards if len(s)]
    if not shards:
        return (*[empty] * gsize,) if gsize > 1 else empty
    node, summed, part = presum(shards)
    bounds = np.searchsorted(part, g0 + np.arange(gsize + 1))
    outs = [pa.table({"node": pa.array(node[bounds[i]:bounds[i + 1]],
                                       pa.int64()),
                      "inc": pa.array(summed[bounds[i]:bounds[i + 1]],
                                      pa.int64())})
            for i in range(gsize)]
    return (*outs,) if gsize > 1 else outs[0]


class FanPlan:
    """Resolved fan topology for one stage invocation.

    Attributes: ``mode`` ('flat'|'tree'|'nodes'), ``chunk`` (dest
    partitions per message shard), ``n_chunks`` (shards per message
    task), and the telemetry pair (``msg_objects``,
    ``crossnode_objects``) per round."""

    def __init__(self, fan: str, n_parts: int,
                 node_groups: int | None = None):
        if fan not in ("flat", "tree", "nodes", "auto"):
            raise ValueError(
                f"fan={fan!r} not in {{'flat', 'tree', 'nodes', 'auto'}}")
        self.n_parts = n_parts
        try:
            from ray.util.scheduling_strategies import \
                NodeAffinitySchedulingStrategy
            self._strategy = NodeAffinitySchedulingStrategy
            self._alive = sorted(n["NodeID"] for n in ray.nodes()
                                 if n.get("Alive")
                                 and n.get("Resources", {}).get("CPU"))
        except Exception:                  # pragma: no cover
            self._strategy = None
            self._alive = []
        if fan == "nodes":
            self.mode = "nodes"
            m_req = node_groups or (len(self._alive)
                                    if len(self._alive) > 1
                                    else max(1, int(round(np.sqrt(n_parts)))))
            m_eff = max(1, min(int(m_req), n_parts))
            self.ppn = (n_parts + m_eff - 1) // m_eff
            self.n_grp = (n_parts + self.ppn - 1) // self.ppn
            self.chunk, self.n_chunks = self.ppn, self.n_grp
            self.msg_objects = n_parts * self.n_grp \
                + self.n_grp * self.n_grp + n_parts
            self.crossnode_objects = self.n_grp * self.n_grp
        elif fan == "tree" or (fan == "auto"
                               and n_parts >= FAN_TREE_MIN_PARTS):
            self.mode = "tree"
            self.group_size = int(np.ceil(np.sqrt(n_parts)))
            self.n_groups = (n_parts + self.group_size - 1) \
                // self.group_size
            self.chunk, self.n_chunks = self.group_size, self.n_groups
            self.msg_objects = n_parts * self.n_groups + n_parts
            self.crossnode_objects = self.msg_objects
        else:
            self.mode = "flat"
            self.chunk, self.n_chunks = 1, n_parts
            self.msg_objects = n_parts * n_parts
            self.crossnode_objects = self.msg_objects

    def aff(self, group: int) -> dict:
        """Soft scheduling hint: keep this group's tasks on one node
        (a no-op single-node; never a hard constraint)."""
        if len(self._alive) <= 1 or self._strategy is None:
            return {}
        return {"scheduling_strategy": self._strategy(
            node_id=self._alive[group % len(self._alive)], soft=True)}

    def msg_options(self, p: int, extra_returns: int = 0) -> dict:
        """``.options(...)`` for partition p's message task: the shard
        count plus the partition's node-group affinity."""
        opts = {"num_returns": self.n_chunks + extra_returns}
        if self.mode == "nodes":
            opts.update(self.aff(p // self.ppn))
        return opts

    def combine(self, msg):
        """Run this round's combines.  ``msg`` is a list over source
        partitions; ``msg[p]`` is the LIST of p's shard refs (one per
        destination chunk — slice the message task's returns to exclude
        any extra returns before passing).  Returns, for each
        destination partition q, the LIST of message refs its
        apply/merge task consumes."""
        P = self.n_parts
        if self.mode == "flat":
            return [[msg[p][q] for p in range(P)] for q in range(P)]
        if self.mode == "tree":
            gs, ng = self.group_size, self.n_groups
            combined = [combine_group.options(num_returns=gs)
                        .remote(g * gs, gs, *[m[g] for m in msg])
                        for g in range(ng)]
            if gs == 1:
                return [[combined[q]] for q in range(P)]
            return [[combined[q // gs][q % gs]] for q in range(P)]
        ppn, ng = self.ppn, self.n_grp
        loc = [[combine_local.options(**self.aff(s)).remote(
                    *[msg[p][g]
                      for p in range(s * ppn, min((s + 1) * ppn, P))])
                for g in range(ng)] for s in range(ng)]
        split = [combine_group.options(num_returns=ppn, **self.aff(g))
                 .remote(g * ppn, ppn, *[loc[s][g] for s in range(ng)])
                 for g in range(ng)]
        if ppn == 1:
            return [[split[q // ppn]] for q in range(P)]
        return [[split[q // ppn][q % ppn]] for q in range(P)]
