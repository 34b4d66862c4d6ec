"""Temporal/streaming-family throughput at event scale.

Deterministic synthetic event log (pure function of (seed, event_id),
embarrassingly-parallel generation) driven through the three
streaming-shaped operators: sessionize, windowed_agg, funnel.

Usage: python tools/temporal_scale.py [n_events] [num_cpus]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
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
    from raydedup.stages.sessions import funnel, sessionize
    from raydedup.stages.temporal import windowed_agg

    cfg = PipelineConfig(num_partitions=max(64, cpus * 2))
    n_users = max(1000, n // 500)
    types = np.array(["view", "click", "purchase", "error"])

    def _gen(batch):
        ids = batch["id"].astype(np.int64)
        rng_base = ids * np.int64(6364136223846793005) + np.int64(97)
        u = (rng_base % n_users).astype(np.int64)
        # event time: per-user increasing-ish stream over ~30 days
        ts_us = (np.abs(rng_base // 7) % (30 * 86_400_000_000)).astype(np.int64)
        ty = types[(np.abs(rng_base // 13) % 4).astype(np.int64)]
        val = ((np.abs(rng_base // 17) % 10_000) / 100.0)
        return pa.table({
            "event_id": pa.array(ids),
            "user_id": pa.array(u),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "event_type": pa.array(ty, pa.string()),
            "value": pa.array(val, pa.float64()),
        })

    events = rd.range(n, override_num_blocks=cfg.num_partitions) \
        .map_batches(_gen, batch_format="numpy").materialize()

    out = {"n_events": n, "num_cpus": cpus, "n_users": n_users}
    t0 = time.time()
    out["sessions"] = sessionize(events, cfg).count()
    out["sessionize_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    out["windowed_rows"] = windowed_agg(
        events.select_columns(["event_id", "user_id", "ts"]), cfg,
        window_minutes=60).count()
    out["windowed_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    out["funnel_users"] = funnel(
        events.select_columns(["user_id", "ts", "event_type"]),
        ("view", "click", "purchase"), cfg).count()
    out["funnel_s"] = round(time.time() - t0, 1)
    out["events_per_sec_sessionize"] = round(n / out["sessionize_s"], 0)
    print(json.dumps(out, sort_keys=True))
    ray.shutdown()


if __name__ == "__main__":
    main()
