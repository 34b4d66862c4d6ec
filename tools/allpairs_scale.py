"""Scale artifact for the EXACT all-pairs Jaccard join
(stages/allpairs.py): 1M docs with an exact planted pair truth, timed
at 32 CPUs, host window recorded.

Corpus (deterministic, generated in-cluster, 50 tokens/doc):
  id % 10 == 1 -> near-dup of doc id-1: first 45 source tokens + 5 own
                  (J = 45/55 = 0.8181... >= 0.8 -> IN, exactly one pair)
  id % 10 == 2 -> half-overlap with doc id-2: first 25 source tokens +
                  25 own (J = 25/75 = 0.33 -> OUT, but its shared
                  tokens have df>=2 so it exercises the
                  candidate-generate-then-reject path; it also shares
                  25 tokens with the sibling near-dup id-1 -> another
                  rejected candidate)
  otherwise    -> 50 doc-unique tokens (df=1 -> zero prefix emission)

Planted truth: EXACTLY the (id-1, id) pairs for id % 10 == 1, every
one at jaccard == 45/55 bit-exactly.  This is deliberately the
worst-case df-map shape (every shared token has df==2, nothing
amortizes), so the recorded df-map size is an upper bound for real
Zipfian text at this scale.

With ``--cross`` the SAME corpus splits by doc_id parity into two
sides (every planted pair spans (even id-1, odd id), so the truth is
unchanged) and runs `crosspairs_jaccard` instead: the id%10==2 docs
share 25 tokens with their WITHIN-side source (id-2, both even) —
candidates the cross join must reject by parity — and 25 with the
cross-side sibling near-dup (id-1, odd) — candidates the verify stage
must reject by score.  Records docs/crosspairs_scale_r5.json.

Usage: python tools/allpairs_scale.py [n_docs] [--cross]
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


def _docs_ds(n_docs: int, n_blocks: int = 64):
    import ray.data as rd

    per = n_docs // n_blocks

    def _gen(batch: pa.Table) -> pa.Table:
        b = int(batch["b"][0].as_py())
        hi = n_docs if b == n_blocks - 1 else (b + 1) * per
        ids = np.arange(b * per, hi, dtype=np.int64)
        mod = ids % 10
        src = np.where(mod == 1, ids - 1,
                       np.where(mod == 2, ids - 2, ids))
        keep = np.where(mod == 1, 45, np.where(mod == 2, 25, 50))
        su = src.astype("U12")
        iu = ids.astype("U12")
        out = None
        for j in range(50):
            shared = np.char.add(np.char.add("u", su), f"_{j}")
            own = np.char.add(np.char.add("o", iu), f"_{j}")
            tok = np.where(j < keep, shared, own)
            out = tok if out is None else np.char.add(
                np.char.add(out, " "), tok)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(out)})

    base = rd.from_arrow(
        [pa.table({"b": pa.array([b], pa.int64())}) for b in range(n_blocks)])
    return base.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def main():
    import ray
    args = [a for a in sys.argv[1:] if a != "--cross"]
    cross = "--cross" in sys.argv[1:]
    n_docs = int(args[0]) if args else 1_000_000
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.allpairs import allpairs_jaccard, crosspairs_jaccard

    cfg = DEFAULT_CONFIG.with_(num_partitions=32)
    docs = _docs_ds(n_docs).materialize()

    st0, tot0 = _host_window()
    t0 = time.perf_counter()
    if cross:
        def _side(parity):
            def _m(t: pa.Table) -> pa.Table:
                ids = np.asarray(t["doc_id"], dtype=np.int64)
                return t.filter(pa.array((ids % 2) == parity))
            return _m
        left = docs.map_batches(_side(0), batch_format="pyarrow",
                                zero_copy_batch=True)
        right = docs.map_batches(_side(1), batch_format="pyarrow",
                                 zero_copy_batch=True)
        pairs = crosspairs_jaccard(left, right, cfg, threshold=0.8,
                                   df_broadcast_max=12_000_000).to_pandas()
    else:
        pairs = allpairs_jaccard(docs, cfg, threshold=0.8,
                                 df_broadcast_max=12_000_000).to_pandas()
    dt = time.perf_counter() - t0
    st1, tot1 = _host_window()

    ids = np.arange(n_docs, dtype=np.int64)
    want_b = ids[ids % 10 == 1]
    want = set(zip((want_b - 1).tolist(), want_b.tolist()))
    got = set(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    j_ok = bool((pairs["jaccard"].to_numpy() == 45.0 / 55.0).all())
    exact = got == want

    rec = {
        "probe": "crosspairs_scale" if cross else "allpairs_scale",
        "n_docs": n_docs,
        "n_tokens": n_docs * 50,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 0),
        "pairs_out": len(got),
        "pairs_expected": len(want),
        "truth_exact": exact,
        "jaccard_bit_exact": j_ok,
        "df_entries_worstcase": int(45 * (n_docs // 10)
                                    + 25 * (n_docs // 10)),
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1),
                               2)},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(rec))
    assert exact, (len(got - want), len(want - got))
    assert j_ok
    ray.shutdown()


if __name__ == "__main__":
    main()
