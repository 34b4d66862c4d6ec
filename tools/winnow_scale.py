"""Scale artifact for MOSS-style winnow-overlap pairs
(stages/textstats.py::winnow_overlap_pairs): 2M docs with an exact
SET-LEVEL planted truth, timed at 32 CPUs.

Corpus (deterministic, generated in-cluster, 50 tokens/doc):
  for id % 10 == 1, docs id-1 and id share a 20-token run (tokens
  keyed by the pair, placed at DIFFERENT offsets: position 10 in the
  even doc, 25 in the odd doc — winnowing is position-aware, the probe
  must not rely on aligned positions); every other token is
  doc-unique.

Truth (exact at the pair-set level, by the winnowing guarantee):
  * a shared run of 20 >= w+k-1 = 8 tokens leaves >= 1 common
    fingerprint -> every planted pair MUST be found at min_shared=1;
  * all non-run tokens are doc-unique, so any shared k-gram is a pure
    run gram of a planted pair -> NO pair outside the planted set can
    appear, and each planted pair's shared count is in [1, 16]
    (16 = pure run k-grams).
  found_pairs == planted set is therefore an exact assertion even
  though per-pair shared counts depend on hash values.

Usage: python tools/winnow_scale.py [n_docs]
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
        pair_key = np.where(mod == 1, ids - 1,
                            np.where(mod == 0, ids, -1))
        run_at = np.where(mod == 1, 25, 10)   # offset differs by side
        in_pair = pair_key >= 0
        pk = pair_key.astype("U12")
        iu = ids.astype("U12")
        out = None
        for j in range(50):
            off = j - run_at
            own = np.char.add(np.char.add("o", iu), f"_{j}")
            use_run = in_pair & (off >= 0) & (off < 20)
            # run token r{pair}_{off}: the token index within the run
            # must match across the pair (off, not j)
            offs = np.where(use_run, off, 0).astype("U4")
            run_tok = np.char.add(np.char.add(np.char.add("r", pk), "_"),
                                  offs)
            tok = np.where(use_run, run_tok, own)
            out = tok if out is None else np.char.add(
                np.char.add(out, " "), tok)
        return pa.table({"doc_id": pa.array(ids),
                         "text": pa.array(out)})

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
    from raydedup.stages.textstats import winnow_overlap_pairs

    cfg = DEFAULT_CONFIG.with_(num_partitions=32)
    docs = _docs_ds(n_docs).materialize()

    st0, tot0 = _host_window()
    t0 = time.perf_counter()
    pairs = winnow_overlap_pairs(docs, cfg, min_shared=1).to_pandas()
    dt = time.perf_counter() - t0
    st1, tot1 = _host_window()

    ids = np.arange(n_docs, dtype=np.int64)
    odd = ids[ids % 10 == 1]
    want = set(zip((odd - 1).tolist(), odd.tolist()))
    got = set(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    shared = pairs["shared"].to_numpy()
    counts_ok = bool(((shared >= 1) & (shared <= 16)).all())

    rec = {
        "probe": "winnow_overlap_scale",
        "n_docs": n_docs,
        "n_tokens": n_docs * 50,
        "sec": round(dt, 2),
        "docs_per_sec": round(n_docs / dt, 0),
        "pairs_out": len(got),
        "pairs_expected": len(want),
        "truth_exact": got == want,
        "shared_counts_in_bounds": counts_ok,
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1),
                               2)},
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    }
    print(json.dumps(rec))
    assert got == want, (len(got - want), len(want - got))
    assert counts_ok
    ray.shutdown()


if __name__ == "__main__":
    main()
