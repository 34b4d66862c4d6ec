"""Adversarial-skew artifact for the flagship near-dup pipeline
(round-5 verdict item #6, SURVEY §"What's hard" #1): a corpus where 30%
of docs are near-identical copies of ONE boilerplate template — the
"empty-ish HTML collapses millions of docs into one band bucket" case —
run through ``near_dup_clusters`` next to the uniform corpus of the same
size, with bucket-cap / salting counters recorded.

Skew corpus = synth_pages_ds(n) with ids where id % 10 < 3 REPLACED by
"<150-token template> x<id>" (pairwise exact Jaccard ≈ 0.97, one true
mega-cluster, disjoint vocab from the synth pages so no accidental
merges).  Every band's bucket for the template key holds ~0.3n docs —
the adaptive over-cap salt chunk (lsh._overcap_chunk) must bound pair
emission to ~4 rows per member per band while keeping the flood
connected.

Checks: the flood comes out as EXACTLY ONE component containing all
flood docs, and skew wall stays within ~1.5x the uniform wall.

Usage: python tools/skew_probe.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def _host_window():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)


TEMPLATE = " ".join(f"t{i}" for i in range(150))


def _skewify(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    ids = np.asarray(batch["doc_id"], dtype=np.int64)
    flood = pa.array(ids % 10 < 3)
    tail = pc.binary_join_element_wise(
        pa.scalar(TEMPLATE), pa.scalar("x"), " ")
    flood_text = pc.binary_join_element_wise(
        tail, pa.array(ids.astype(str)), "")
    return pa.table({
        "doc_id": batch["doc_id"],
        "text": pc.if_else(flood, flood_text, batch["text"]),
    })


def _run(docs, cfg, label: str) -> dict:
    from raydedup.pipelines.neardup import near_dup_clusters
    from raydedup.state import RunCounters
    rc = RunCounters()
    t0 = time.perf_counter()
    labels = near_dup_clusters(docs, cfg, counters=rc.actor).materialize()
    wall = time.perf_counter() - t0
    comp = labels.to_pandas()
    sizes = comp.groupby("component").size()
    counters = rc.get()
    return {
        "wall_s": round(wall, 2),
        "clustered_docs": int(len(comp)),
        "n_components": int(len(sizes)),
        "largest_component": int(sizes.max()) if len(sizes) else 0,
        "counters": {k: int(v) for k, v in sorted(counters.items())
                     if not k.startswith("time_")},
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import PipelineConfig
    from raydedup.sources.synth import synth_pages_ds

    cfg = PipelineConfig(num_partitions=64)
    st0, tot0 = _host_window()

    base = synth_pages_ds(n, seed=42).materialize()
    uniform = _run(base, cfg, "uniform")

    skew_docs = base.map_batches(_skewify, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
    skew = _run(skew_docs, cfg, "skew")

    n_flood = len(range(0, n, 10)) + len(range(1, n, 10)) + len(range(2, n, 10))
    st1, tot1 = _host_window()
    res = {
        "n_docs": n, "flood_docs": n_flood, "flood_frac": 0.3,
        "uniform": uniform, "skew": skew,
        "wall_ratio": round(skew["wall_s"] / uniform["wall_s"], 3),
        "flood_one_component": bool(
            skew["largest_component"] == n_flood),
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2),
            "loadavg": os.getloadavg()[0]},
    }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
