"""Scale artifact for BM25 ranking (stages/search.py): 2M docs with a
CLOSED-FORM planted ranking truth, timed at 32 CPUs.

Corpus (deterministic, generated in-cluster):
  doc i: dl = 40 + (i % 11) non-empty tokens;
         tf("hash") = i % 4, tf("join") = (i // 4) % 3
         (both planted at the front), remainder doc-unique tokens.

Every (tf_hash, tf_join, dl) combination appears ~n/132 times, so the
rank-k boundary is a massive tie the min-id rule must break
deterministically.  The truth side needs NO text processing: df / dl /
tf are closed-form arrays, so the reference ranking is an independent
numpy evaluation of the BM25 integer contract (per-term e6 rounding →
integer sum → (-score, id) sort) over all 2M docs on the driver.

Usage: python tools/bm25_scale.py [n_docs] [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

TERMS = ["hash", "join"]


def _host_window():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)


def _tf_dl(ids: np.ndarray):
    tf = np.stack([ids % 4, (ids // 4) % 3], axis=1).astype(np.int64)
    dl = 40 + (ids % 11)
    return tf, dl


def _docs_ds(n_docs: int, n_blocks: int = 64):
    import ray.data as rd

    per = n_docs // n_blocks

    def _gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        hi = n_docs if b == n_blocks - 1 else (b + 1) * per
        ids = np.arange(b * per, hi, dtype=np.int64)
        tf, dl = _tf_dl(ids)
        iu = ids.astype("U12")
        out = None
        max_dl = int(dl.max())
        for j in range(max_dl):
            tok = np.where(j < tf[:, 0], "hash",
                           np.where(j < tf[:, 0] + tf[:, 1], "join",
                                    np.char.add(np.char.add("o", iu),
                                                f"_{j}")))
            tok = np.where(j < dl, tok, "")
            out = tok if out is None else np.char.add(
                np.char.add(out, " "), tok)
        # trailing separators for short docs produce empty tokens,
        # which the stage (and dl truth) ignore by contract
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(np.char.strip(out))})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def _ref_topk(n_docs: int, k: int, k1=1.2, b=0.75):
    """Closed-form reference ranking via the same integer contract."""
    from raydedup.functions.numeric import round_half_away
    ids = np.arange(n_docs, dtype=np.int64)
    tf, dl = _tf_dl(ids)
    n = n_docs
    avgdl = float(dl.sum()) / float(n)
    df = (tf > 0).sum(axis=0)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1)
    tff = tf.astype(np.float64)
    denom = tff + k1 * (1.0 - b + b * dl.astype(np.float64)[:, None]
                        / avgdl)
    c_e6 = round_half_away(idf[None, :] * tff * (k1 + 1.0) / denom
                           * 1e6).astype(np.int64)
    score = c_e6.sum(axis=1)
    hit = tf.sum(axis=1) > 0
    ids, score = ids[hit], score[hit]
    order = np.lexsort((ids, -score))[:k]
    return list(zip(ids[order].tolist(), score[order].tolist()))


def main():
    import ray
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.search import bm25_topk

    docs = _docs_ds(n_docs).materialize()
    n_tokens = int(sum(40 + (i % 11) for i in range(132))
                   * (n_docs / 132))

    st0, tot0 = _host_window()
    t0 = time.perf_counter()
    got = bm25_topk(docs, TERMS, DEFAULT_CONFIG, k=k).to_pandas()
    dt = time.perf_counter() - t0
    st1, tot1 = _host_window()

    want = _ref_topk(n_docs, k)
    got_l = list(zip(got["doc_id"].tolist(), got["score_e6"].tolist()))
    exact = got_l == want

    rec = {
        "probe": "bm25_scale",
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "k": k,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 0),
        "tokens_per_sec": round(n_tokens / dt, 0),
        "topk_exact": exact,
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1),
                               2)},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(rec))
    assert exact, (got_l[:5], want[:5])
    ray.shutdown()


if __name__ == "__main__":
    main()
