"""Checkpoint/resume drill at corpus scale (round-5 verdict item #7):
run the checkpointed flagship pipeline at 5M docs, simulate a crash
right after the candidate stage (later stage outputs destroyed), resume,
and assert the resumed labels are IDENTICAL to the uninterrupted run's —
with wall-times for both.  The 5k-doc version lives in
tests/test_checkpoint.py::test_kill_after_candidates_resume_identical;
this is the same drill at the scale the 100-TB design claims.

Usage: python tools/resume_drill.py [n_docs]   (default 5_000_000)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _host_window():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7], sum(vals)


def _labels_digest(labels_ds) -> tuple[str, int]:
    df = labels_ds.to_pandas().sort_values(["node", "component"]) \
        .reset_index(drop=True)
    h = hashlib.sha256()
    h.update(df["node"].to_numpy("int64").tobytes())
    h.update(df["component"].to_numpy("int64").tobytes())
    return h.hexdigest(), len(df)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from raydedup.config import PipelineConfig
    from raydedup.pipelines.checkpoint import near_dup_pipeline_checkpointed
    from raydedup.sources.synth import synth_pages_ds

    cfg = PipelineConfig(num_partitions=64)
    root = "/tmp/raydedup_resume_drill"
    shutil.rmtree(root, ignore_errors=True)
    st0, tot0 = _host_window()

    t0 = time.perf_counter()
    docs = synth_pages_ds(n, seed=42).materialize()
    gen_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    labels1, mgr1 = near_dup_pipeline_checkpointed(docs, cfg, root)
    digest1, rows1 = _labels_digest(labels1)
    full_sec = time.perf_counter() - t0

    # crash after the candidate stage: everything downstream is lost
    shutil.rmtree(os.path.join(root, "verified_pairs"))
    shutil.rmtree(os.path.join(root, "components"))

    t0 = time.perf_counter()
    labels2, mgr2 = near_dup_pipeline_checkpointed(docs, cfg, root)
    digest2, rows2 = _labels_digest(labels2)
    resume_sec = time.perf_counter() - t0

    st1, tot1 = _host_window()
    res = {
        "n_docs": n, "gen_sec": round(gen_sec, 1),
        "full_run_sec": round(full_sec, 1),
        "resumed_run_sec": round(resume_sec, 1),
        "resume_speedup": round(full_sec / resume_sec, 2),
        "resume_events": dict(mgr2.events),
        "label_rows": rows1,
        "labels_identical": bool(digest1 == digest2 and rows1 == rows2),
        "labels_sha256": digest1[:16],
        "host_window": {
            "steal_pct": round(100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2),
            "loadavg": os.getloadavg()[0]},
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
