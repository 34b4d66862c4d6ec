"""Scale artifacts for the round-4 session-3 operators: PageRank,
heavy hitters, HLL — run at deliberately larger-than-test scale and
record throughput + host window.  Usage:
    python tools/scale_new_ops.py [pagerank|graph2|hh|hll|all]
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


def _edges_ds(n_nodes: int, n_edges: int, n_blocks: int = 64):
    """Deterministic skewed graph: 90% uniform edges, 10% into a
    1000-node hub set (the head a web host graph actually has)."""
    import ray.data as rd

    per = n_edges // n_blocks

    def _gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        i = np.arange(b * per, (b + 1) * per, dtype=np.uint64)
        src = ((i * np.uint64(2654435761)) ^ (i >> np.uint64(13))) \
            % np.uint64(n_nodes)
        h = (i * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(3)
        dst_uniform = h % np.uint64(n_nodes)
        dst_hub = h % np.uint64(1000)
        hub = (i % np.uint64(10)) == np.uint64(0)
        dst = np.where(hub, dst_hub, dst_uniform)
        return pa.table({"src": pa.array(src.astype(np.int64)),
                         "dst": pa.array(dst.astype(np.int64))})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def _zipf_docs_ds(n_docs: int, n_blocks: int = 64):
    import ray.data as rd

    per = n_docs // n_blocks

    def _gen(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = int(batch["b"][0].as_py())
        rng = np.random.RandomState(1234 + b)
        toks = rng.zipf(1.25, size=(per, 40)) % 2_000_000
        # vectorized join: build "w<id>" strings column-wise
        cols = [pc.binary_join_element_wise(
            pa.scalar("w"), pa.array(toks[:, j].astype(str)), "")
            for j in range(toks.shape[1])]
        text = cols[0]
        for c in cols[1:]:
            text = pc.binary_join_element_wise(text, c, " ")
        ids = np.arange(b * per, (b + 1) * per, dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids), "text": text})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def run(which: str):
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    out = {}

    st0, tot0 = _host_window()

    if which in ("pagerank", "all"):
        from raydedup.stages.pagerank import pagerank
        n_nodes, n_edges = 2_000_000, 20_000_000
        # P tracks cores: each round creates P*(P+1) small objects, so
        # P=64 on 32 CPUs is 3-8x slower (see pagerank.py docstring)
        cfg = DEFAULT_CONFIG.with_(num_partitions=32)
        edges = _edges_ds(n_nodes, n_edges).materialize()
        t0 = time.perf_counter()
        pr = pagerank(edges, cfg, n_iter=5)
        n_out = pr.count()
        dt = time.perf_counter() - t0
        out["pagerank"] = {
            "n_nodes": n_nodes, "n_edges": n_edges, "n_iter": 5,
            "nodes_out": n_out, "sec": round(dt, 2),
            "edges_per_sec_per_iter": round(n_edges * 5 / dt, 0)}

    if which in ("graph2", "all"):
        from raydedup.stages.bfs import bfs_distances
        from raydedup.stages.hits import hits
        from raydedup.stages.kcore import k_core
        n_nodes, n_edges = 2_000_000, 20_000_000
        cfg = DEFAULT_CONFIG.with_(num_partitions=32)
        edges = _edges_ds(n_nodes, n_edges).materialize()
        t0 = time.perf_counter()
        nb = bfs_distances(edges, range(1000), cfg, max_hops=8).count()
        dt_b = time.perf_counter() - t0
        t0 = time.perf_counter()
        nh = hits(edges, cfg, n_iter=4).count()
        dt_h = time.perf_counter() - t0
        t0 = time.perf_counter()
        nk = k_core(edges, cfg, 15).count()
        dt_k = time.perf_counter() - t0
        out["graph2"] = {
            "n_nodes": n_nodes, "n_edges": n_edges,
            "bfs": {"reached": nb, "hops": 8, "sec": round(dt_b, 2)},
            "hits": {"nodes": nh, "iters": 4, "sec": round(dt_h, 2)},
            "kcore": {"k": 15, "core_size": nk, "sec": round(dt_k, 2)}}

    if which in ("hh", "all"):
        from raydedup.stages.vocab import heavy_hitters, top_k_vocab
        docs = _zipf_docs_ds(2_000_000).materialize()
        t0 = time.perf_counter()
        hh = heavy_hitters(docs, DEFAULT_CONFIG.with_(num_partitions=32),
                           support_num=1, support_den=10_000)
        n_hh = hh.count()
        dt_hh = time.perf_counter() - t0
        t0 = time.perf_counter()
        tv = top_k_vocab(docs, DEFAULT_CONFIG.with_(num_partitions=32),
                         k=100)
        tv.count()
        dt_tv = time.perf_counter() - t0
        out["heavy_hitters"] = {
            "n_docs": 2_000_000, "tokens": 80_000_000,
            "support": "1/10000", "hitters": n_hh,
            "sec": round(dt_hh, 2),
            "docs_per_sec": round(2_000_000 / dt_hh, 0),
            "top_k_vocab_sec": round(dt_tv, 2)}

    if which in ("hll", "all"):
        from raydedup.stages.cardinality import approx_distinct
        docs = _zipf_docs_ds(2_000_000).materialize()
        t0 = time.perf_counter()
        est = approx_distinct(docs, DEFAULT_CONFIG.with_(num_partitions=32),
                              tokens=True)
        dt = time.perf_counter() - t0
        out["hll"] = {"n_docs": 2_000_000, "tokens": 80_000_000,
                      "estimate": int(est["n_distinct_est"][0].as_py()),
                      "sec": round(dt, 2),
                      "tokens_per_sec": round(80_000_000 / dt, 0)}

    st1, tot1 = _host_window()
    out["host_window"] = {
        "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2),
        "loadavg": os.getloadavg()[0]}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "all")
