"""Node-scaling probe: distinguish DRAM contention from single-process
serial bottlenecks (plasma store thread, driver) for the dominant
pipeline stage.

The sandbox stand-in for N-vs-4N NODES keeps ONE Ray instance (one
plasma store, one driver) at both CPU counts — so its measured
efficiency conflates software scaling with that instance's serial
paths.  This probe runs the fused signature→band-emission map (the
dominant, embarrassingly-parallel stage) two ways:

  solo : one 8-CPU Ray process over N docs
  quad : four CONCURRENT 8-CPU Ray processes, each over N/4 distinct
         docs — four separate plasma stores and drivers on one socket,
         i.e. four emulated nodes sharing only DRAM

If quad's wall ≈ solo/4-ish per shard (all four finish near a single
N/4 run's time), per-node software overheads are flat and the remaining
gap to ideal IS memory-system contention — the component a real
multi-node cluster adds with every node.

    python tools/node_scaling_probe.py [total_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000

WORKER = r"""
import json, os, sys, time
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from raydedup.config import DEFAULT_CONFIG
from raydedup.sources.synth import synth_pages_ds
from raydedup.stages.lsh import candidate_pairs_from_docs

n = int(sys.argv[1]); seed = int(sys.argv[2])
cfg = DEFAULT_CONFIG.with_(num_partitions=16)
docs = synth_pages_ds(n, seed=seed, avg_tokens=300).materialize()
t0 = time.time()
c = candidate_pairs_from_docs(docs, cfg).materialize()
wall = time.time() - t0
print(json.dumps({"n": n, "seed": seed, "wall": round(wall, 2),
                  "pairs": c.count()}))
ray.shutdown()
"""


def run(n, seed):
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, str(n), str(seed)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(procs):
    outs = []
    for p in procs:
        out, _ = p.communicate()
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


if __name__ == "__main__":
    # solo: one 8-CPU "node", full corpus
    t0 = time.time()
    solo = collect([run(TOTAL, 42)])[0]
    # quarter reference: one 8-CPU node, quarter corpus (per-shard ideal)
    quarter = collect([run(TOTAL // 4, 43)])[0]
    # quad: four concurrent 8-CPU "nodes", quarter corpus each
    t0 = time.time()
    procs = [run(TOTAL // 4, 100 + i) for i in range(4)]
    quads = collect(procs)
    quad_wall = round(time.time() - t0, 2)
    per_node = [q["wall"] for q in quads]
    eff_vs_solo = round(solo["wall"] / quad_wall / 4 * 4, 3)  # T1/T4nodes
    print(json.dumps({
        "metric": "node_scaling_probe",
        "stage": "fused signatures -> candidates",
        "solo_8cpu_full": solo["wall"],
        "quarter_8cpu": quarter["wall"],
        "quad_4x8cpu_wall": quad_wall,
        "quad_per_node_walls": per_node,
        "node_scaling_efficiency": round(solo["wall"] / quad_wall, 3),
        "dram_contention_factor": round(max(per_node) / quarter["wall"], 3),
        "total_docs": TOTAL,
    }))
