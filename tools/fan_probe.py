"""Message-fan probe for the iterative graph stages (pagerank + hits
fan=, the shared stages/fan.py machinery): bit-identity + objects/round
+ wall across flat / tree / nodes at a multi-node-scale partition
count.

Why P=128: single-node runs keep P ≈ cores (32), but a 4-node × 32-core
cluster runs P=128 — the regime where the flat fan's P² object storm
(16 384/round) is scheduler-bound and the verdict-r4 TODO (two-level
node-local combine, pagerank.py) pays off.  The nodes fan at M=4
emulates that 4-node cluster's grouping on this box: its analytic
cross-node object count per round is M² = 16 vs tree's P·G+P ≈ 1 664
and flat's 16 384 — the counts are asserted from the stage's own
telemetry counters, and all three fans must produce BIT-IDENTICAL
integer fixed-point ranks.

    python tools/fan_probe.py [n_edges] [n_parts]

Writes one JSON line; commit as docs/fan_probe_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
N_PARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N_ITER = 3
NODE_GROUPS = 4          # emulate a 4-node cluster


def main() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.pagerank import pagerank
    from raydedup.state import RunCounters

    # deterministic scale-free-ish graph: hub-biased destinations
    n_nodes = N_EDGES // 10
    src = (np.arange(N_EDGES, dtype=np.int64) * 2654435761) % n_nodes
    dst = np.where(np.arange(N_EDGES) % 7 == 0,
                   src % 1000,                      # hub tail
                   (src * 31 + 17) % n_nodes)
    tab = pa.table({"src": pa.array(src, pa.int64()),
                    "dst": pa.array(dst, pa.int64())})
    cfg = DEFAULT_CONFIG.with_(num_partitions=N_PARTS)
    edges = rd.from_arrow(tab).materialize()

    out = {"n_edges": N_EDGES, "n_parts": N_PARTS, "n_iter": N_ITER,
           "node_groups": NODE_GROUPS, "num_cpus": 32, "fans": {}}
    digests = {}
    for fan, kw in (("nodes", {"node_groups": NODE_GROUPS}),
                    ("tree", {}), ("flat", {})):
        rc = RunCounters()
        t0 = time.time()
        res = pagerank(edges, cfg, n_iter=N_ITER, fan=fan,
                       counters=rc.actor, **kw)
        tabs = [t for t in ray.get(res.to_arrow_refs()) if len(t)]
        wall = round(time.time() - t0, 2)
        t = pa.concat_tables(tabs)
        node = np.asarray(t["node"], dtype=np.int64)
        rank = np.asarray(t["rank_fp"], dtype=np.int64)
        o = np.argsort(node)
        digests[fan] = hash((node[o].tobytes(), rank[o].tobytes()))
        got = rc.get()
        out["fans"][fan] = {
            "wall_sec": wall,
            "msg_objects_per_round":
                int(got["pagerank_msg_objects_per_round"]),
            "crossnode_objects_per_round":
                int(got["pagerank_crossnode_objects_per_round"]),
        }
    out["bit_identical"] = len(set(digests.values())) == 1
    assert out["bit_identical"], digests

    # HITS through the same three fans (two half-steps per round, so
    # telemetry counts are 2× the per-exchange figures)
    from raydedup.stages.hits import hits
    out["hits_fans"] = {}
    hdig = {}
    for fan, kw in (("nodes", {"node_groups": NODE_GROUPS}),
                    ("tree", {}), ("flat", {})):
        rc = RunCounters()
        t0 = time.time()
        res = hits(edges, cfg, n_iter=N_ITER, fan=fan,
                   counters=rc.actor, **kw)
        tabs = [t for t in ray.get(res.to_arrow_refs()) if len(t)]
        wall = round(time.time() - t0, 2)
        t = pa.concat_tables(tabs)
        node = np.asarray(t["node"], dtype=np.int64)
        hub = np.asarray(t["hub_fp"], dtype=np.int64)
        auth = np.asarray(t["auth_fp"], dtype=np.int64)
        o = np.argsort(node)
        hdig[fan] = hash((node[o].tobytes(), hub[o].tobytes(),
                          auth[o].tobytes()))
        got = rc.get()
        out["hits_fans"][fan] = {
            "wall_sec": wall,
            "msg_objects_per_round":
                int(got["hits_msg_objects_per_round"]),
            "crossnode_objects_per_round":
                int(got["hits_crossnode_objects_per_round"]),
        }
    out["hits_bit_identical"] = len(set(hdig.values())) == 1
    assert out["hits_bit_identical"], hdig
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
