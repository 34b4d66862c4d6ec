"""Dup-pair recall at corpus scale — the north-rule headline metric.

Truth construction: the synthetic corpus (sources/synth.synth_pages_ds)
plants its near-duplicate structure ONLY within doc-id quads (every 5th
quad = one base + 3 perturbed copies; all other docs are independent
zipf draws), so the exact ≥τ pair set is computable without an all-pairs
scan: enumerate the 6 within-quad pairs per planted quad and score them
with the SAME exact-Jaccard verifier the pipeline uses (threshold-kept
pairs = truth).  Cross-quad accidental duplicates can only ADD found
pairs, never remove truth pairs, so recall measured against this set is
exact for the planted structure and conservative overall.

Usage: python tools/recall_at_scale.py [n_docs] [num_cpus]
Prints one JSON line {n_docs, truth_pairs, found_pairs, matched,
recall, wall_s}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import PipelineConfig
    from raydedup.pipelines.neardup import near_dup_pairs, verify_candidates
    from raydedup.sources.synth import synth_pages_ds

    cfg = PipelineConfig(num_partitions=max(32, cpus * 2))
    docs = synth_pages_ds(n, seed=42).materialize()

    # truth: all 6 within-quad pairs of every planted quad (INCLUDING a
    # trailing partial quad when n % 4 != 0 — its members are still
    # perturbed copies of the base), exact-scored
    quads = np.arange(0, (n + 3) // 4, 5, dtype=np.int64)
    base = quads * 4
    offs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    a = np.concatenate([base + i for i, _ in offs])
    b = np.concatenate([base + j for _, j in offs])
    keep = (a < n) & (b < n)
    cand = rd.from_arrow(pa.table({"a": pa.array(a[keep], pa.int64()),
                                   "b": pa.array(b[keep], pa.int64())}))
    t0 = time.time()
    truth_tab = verify_candidates(docs, cand, cfg, threshold=cfg.verify_threshold) \
        .select_columns(["a", "b"]).to_pandas()
    truth = set(zip(truth_tab["a"], truth_tab["b"]))
    t_truth = time.time() - t0

    t0 = time.time()
    found_tab = near_dup_pairs(docs, cfg).select_columns(["a", "b"]).to_pandas()
    found = set(zip(found_tab["a"], found_tab["b"]))
    t_found = time.time() - t0

    matched = len(found & truth)
    out = {
        "n_docs": n, "num_cpus": cpus,
        "threshold": cfg.verify_threshold,
        "truth_pairs": len(truth), "found_pairs": len(found),
        "matched": matched,
        "recall": round(matched / len(truth), 6) if truth else None,
        "extra_found_outside_planted": len(found - truth),
        "truth_wall_s": round(t_truth, 1),
        "pipeline_wall_s": round(t_found, 1),
    }
    print(json.dumps(out, sort_keys=True))
    ray.shutdown()


if __name__ == "__main__":
    main()
