"""Scale artifact for ngram_novelty (stages/novelty.py): 2M docs with
an EXACT per-doc planted truth, timed at 32 CPUs, host window recorded.

Corpus (deterministic, generated in-cluster, k_shingle=5):
  id % 20 == 19 -> exact COPY of doc id-19 (novelty must be 0)
  id % 20 ==  9 -> 50 doc-unique tokens + a shared 10-token boilerplate
                   tail: 56 shingles, 6 of them pure-boilerplate, novel
                   only for the minimum boilerplate doc (id 9) — the
                   hot-shingle skew case (100k-owner shingle groups)
  otherwise     -> 50 doc-unique tokens: novelty exactly 1.0 (46/46)

Every row's (n_shingles, n_novel) is asserted distributedly against the
closed-form rule — zero violations required.

Usage: python tools/novelty_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

BOILER = " ".join(f"B{j}" for j in range(10))


def _host_window():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)


def _unique_texts(ids: np.ndarray) -> np.ndarray:
    base = np.char.add("u", ids.astype("U12"))
    parts = []
    for j in range(50):
        parts.append(np.char.add(base, f"_{j}"))
    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(np.char.add(out, " "), p)
    return out


def _docs_ds(n_docs: int, n_blocks: int = 64):
    import ray.data as rd

    per = n_docs // n_blocks

    def _gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        ids = np.arange(b * per, (b + 1) * per, dtype=np.int64)
        mod = ids % 20
        src = np.where(mod == 19, ids - 19, ids)   # copies read their source
        text = _unique_texts(src)
        boiler = mod == 9
        text = np.where(boiler, np.char.add(np.char.add(text, " "), BOILER),
                        text)
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(text)})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def main():
    import ray
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.novelty import ngram_novelty

    cfg = DEFAULT_CONFIG.with_(num_partitions=32)
    docs = _docs_ds(n_docs).materialize()
    n_tokens = n_docs * 50 + (n_docs // 20) * 10

    st0, tot0 = _host_window()
    t0 = time.perf_counter()
    out = ngram_novelty(docs, cfg).materialize()
    dt = time.perf_counter() - t0
    st1, tot1 = _host_window()

    def _check(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        ns = np.asarray(t["n_shingles"], dtype=np.int64)
        nn = np.asarray(t["n_novel"], dtype=np.int64)
        mod = ids % 20
        want_ns = np.where(mod == 9, 56, 46)
        want_nn = np.where(mod == 19, 0,
                           np.where(mod == 9, np.where(ids == 9, 56, 50),
                                    46))
        bad = (ns != want_ns) | (nn != want_nn)
        return pa.table({"bad": pa.array([int(bad.sum())], pa.int64()),
                         "rows": pa.array([len(ids)], pa.int64())})

    chk = out.map_batches(_check, batch_format="pyarrow").to_pandas()
    n_bad, n_rows = int(chk["bad"].sum()), int(chk["rows"].sum())

    rec = {
        "probe": "ngram_novelty_scale",
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 0),
        "tokens_per_sec": round(n_tokens / dt, 0),
        "rows_out": n_rows,
        "planted_violations": n_bad,
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2)},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(rec))
    assert n_rows == n_docs, (n_rows, n_docs)
    assert n_bad == 0, f"{n_bad} planted-truth violations"
    ray.shutdown()


if __name__ == "__main__":
    main()
