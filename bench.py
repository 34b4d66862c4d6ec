"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR testdata plus
a compute-dominated synthetic near-dup run; prints ONE JSON line.

    python bench.py              # full run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # same job at 8 and 32 CPUs in fresh
                                 # processes; reports throughputs +
                                 # scaling efficiency

The scaling run is the sandbox stand-in for the N-node vs 4N-node
cluster criterion (BASELINE.json): same input, two parallelism levels,
fresh Ray sessions, efficiency = (t_lo / t_hi) / (cpus_hi / cpus_lo).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("GRAFT_SYNTH_DOCS", "20000"))
# scaling runs use a bigger corpus with shorter docs so compute (not
# per-op fixed cost) dominates the measurement
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "1200000"))
SLIM = os.environ.get("GRAFT_BENCH_SLIM") == "1"


def _calibrate() -> float:
    """Fixed single-threaded probe (min-of-3 warm; ~0.17 s on a quiet
    window): sort + hash-mix a deterministic 8M-element array.  Purely
    CPU+DRAM bound, zero Ray.
    Its wall time calibrates the host-noise window the suite ran in —
    this box is a VM on an oversubscribed hypervisor (loadavg 1→28 with
    zero guest processes; CPU steal visible in /proc/stat), so absolute
    timings are only comparable between runs with similar calib times."""
    import numpy as np
    base = np.arange(8_000_000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    best = None
    for rep in range(4):  # rep 0 = untimed page-fault warmup
        t0 = time.perf_counter()
        x = np.sort(base ^ (base >> np.uint64(31)))
        dt = time.perf_counter() - t0
        assert int(x[::1024].sum()) != 0
        if rep:
            best = dt if best is None else min(best, dt)
    return round(best, 3)


def _steal_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — hypervisor CPU steal."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(v) for v in parts]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except Exception:
        return 0, 0


def _host_window(fn):
    """Run fn() bracketed by calibration probes + steal accounting;
    returns (result, evidence-dict)."""
    calib_pre = _calibrate()
    st0, tot0 = _steal_jiffies()
    load_pre = os.getloadavg()[0]
    out = fn()
    st1, tot1 = _steal_jiffies()
    calib_post = _calibrate()
    dtot = max(tot1 - tot0, 1)
    return out, {
        "calib_sec": [calib_pre, calib_post],
        "steal_pct": round(100.0 * (st1 - st0) / dtot, 2),
        "loadavg_pre": round(load_pre, 2),
        "loadavg_post": round(os.getloadavg()[0], 2),
    }
# near-dup signature strategy for the scaling run (see
# pipelines/neardup.py): "slim" streams fused band-only signatures and
# recomputes shingle sets for candidate endpoints; "full" materializes
# the complete signature table once
STRATEGY = os.environ.get("GRAFT_NEARDUP_STRATEGY", "slim")


def run_bench() -> dict:
    import ray
    init_kw = {}
    if SLIM:
        # scaling corpus: keep everything (text + band rows + blobs +
        # shuffle intermediates) out of disk spill — the node has 128 GiB
        init_kw["object_store_memory"] = int(60e9)
    ray.init(address="local", num_cpus=NCPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", **init_kw)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.neardup import near_dup_clusters, near_dup_pairs
    from raydedup.sources.synth import synth_pages_ds
    from raydedup.stages.ann import ann_topk_bruteforce
    from raydedup.stages.dedup import exact_dup_groups
    from raydedup.stages.graph import edge_jaccard
    from raydedup.stages.signatures import signatures

    # fixed partition count at every parallelism level: partitioning is
    # data-driven; the scaling comparison must run the SAME physical job.
    # 64 measured best on the 1.2M-doc scaling corpus (smaller reduce
    # partitions → shorter straggler tail); the small sf-suite tables
    # use 32 (also data-driven — fewer rows per partition otherwise).
    cfg = DEFAULT_CONFIG.with_(num_partitions=64 if SLIM else 32)

    timings: dict[str, float] = {}

    def timed(name, fn, reps: int = 1):
        best = None
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    if SLIM:
        # scaling mode: only the headline near-dup pipeline, on a corpus
        # big enough to be compute-dominated
        from raydedup.state import RunCounters
        n = SCALING_DOCS
        synth = synth_pages_ds(n, seed=42, avg_tokens=300).materialize()
        # UNTIMED warmup: spawn every worker process and pull the
        # library imports into the page cache before the clock starts.
        # A cold 32-worker spawn (32 × numpy/pyarrow/ray imports off a
        # cold page cache) measured 40-60 s of pure startup attributed
        # to the first pipeline run — and it penalizes the HI side of
        # the scaling pair proportionally more (more workers to spawn),
        # deflating measured efficiency with a cost that amortizes to
        # zero on a real long-running job.
        warm = synth_pages_ds(20000, seed=7, avg_tokens=300).materialize()
        near_dup_pairs(warm, cfg, strategy=STRATEGY).count()
        rc = RunCounters()
        n_pairs, window = _host_window(lambda: timed(
            "neardup_synth",
            lambda: near_dup_pairs(synth, cfg, strategy=STRATEGY,
                                   counters=rc.actor).count()))
        total = round(sum(timings.values()), 3)
        result = {
            "metric": "graft_bench_seconds", "value": total, "unit": "sec",
            "queries": timings, "sf": SF_DIR, "num_cpus": NCPUS,
            "synth_docs": n, "synth_dup_pairs": int(n_pairs),
            "docs_per_sec_neardup": round(n / timings["neardup_synth"], 1),
            # per-stage wall times + flow counters (the EVENT_PROFILE
            # analogue: reference standalone_algorithms.hpp:38-47)
            "stages": rc.get(),
            "host_window": window,
        }
        ray.shutdown()
        return result

    # warm the page cache (untimed) so we measure compute + shuffle
    for t in ("documents", "lineitem", "embeddings"):
        rd.read_parquet(f"{SF_DIR}/{t}.parquet").count()
    # pre-generate the synthetic corpus (untimed) and pin it
    synth = synth_pages_ds(SYNTH_DOCS, seed=42).materialize()

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    import pyarrow as pa

    def _edges():
        return li.map_batches(
            lambda t: pa.table({"src": t["l_partkey"].cast(pa.int64()),
                                "dst": t["l_suppkey"].cast(pa.int64())}),
            batch_format="pyarrow")

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    suite = [
        ("signatures_sf", lambda: signatures(docs, cfg).count()),
        ("neardup_clusters_sf", lambda: near_dup_clusters(docs, cfg).count()),
        ("exact_dedup_sf", lambda: exact_dup_groups(docs, cfg).count()),
        ("edge_jaccard_sf", lambda: edge_jaccard(_edges(), cfg).count()),
        ("ann_topk_sf", lambda: ann_topk_bruteforce(
            emb, query_ids=[0, 1, 2], k=10, cfg=cfg).count()),
        # headline: compute-dominated near-dup on the synthetic corpus
        ("neardup_synth", lambda: near_dup_pairs(synth, cfg).count()),
    ]

    # INTERLEAVED median-of-REPS per query: the whole suite runs
    # round-robin so every query's reps sample the same host-noise
    # window, and the median rejects one bad/lucky rep per query —
    # single-run noise on this shared host reaches ±60% (BASELINE.md),
    # and round 2's official artifact was incomparable to round 1's for
    # exactly that reason.  Raw per-rep times are emitted alongside.
    #
    # STEAL-GATED capture: two consecutive rounds cut their official
    # artifact inside a dirty hypervisor window (r2: 7.5% steal).  The
    # suite now re-runs itself up to GRAFT_BENCH_ATTEMPTS times until
    # the bracketing steal probe reads under GRAFT_BENCH_STEAL_GATE %,
    # then reports the cleanest attempt — every attempt's host window
    # stays in the artifact so the gate is auditable.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    steal_gate = float(os.environ.get("GRAFT_BENCH_STEAL_GATE", "5.0"))
    # r4 post-mortem: 3 attempts back-to-back all landed in the same
    # dirty hypervisor window (22.8/5.7/5.5% steal) and the official
    # artifact carried a 2x-inflated number the repo's own later capture
    # contradicted.  Two fixes: double the attempt budget, and WAIT FOR
    # QUIET between attempts — retrying immediately just re-samples the
    # same noisy neighbor.
    max_attempts = max(1, int(os.environ.get("GRAFT_BENCH_ATTEMPTS", "6")))
    # max seconds to wait (polling steal in 20 s probes) before retrying
    wait_budget = float(os.environ.get("GRAFT_BENCH_WAIT_QUIET", "300"))
    n_pairs = 0

    def _wait_for_quiet(budget: float) -> None:
        """Poll /proc/stat steal in 20 s windows until one reads under
        the gate or the budget runs out — attempts then start in a
        plausibly-clean window instead of re-sampling the dirty one."""
        t_end = time.time() + budget
        while time.time() < t_end:
            st0, tot0 = _steal_jiffies()
            time.sleep(20)
            st1, tot1 = _steal_jiffies()
            pct = 100.0 * (st1 - st0) / max(tot1 - tot0, 1)
            if pct < steal_gate:
                return

    def _suite_reps(raw):
        nonlocal n_pairs
        for _ in range(reps):
            for name, fn in suite:
                t0 = time.time()
                out = fn()
                raw[name].append(round(time.time() - t0, 3))
                if name == "neardup_synth":
                    n_pairs = int(out)

    attempts: list[tuple[dict, dict]] = []
    for i in range(max_attempts):
        if i and attempts[-1][1]["steal_pct"] >= steal_gate:
            _wait_for_quiet(wait_budget)
        raw: dict[str, list[float]] = {name: [] for name, _ in suite}
        _, window = _host_window(lambda: _suite_reps(raw))
        attempts.append((raw, window))
        if window["steal_pct"] < steal_gate:
            break

    used = min(range(len(attempts)),
               key=lambda i: attempts[i][1]["steal_pct"])
    raw, window = attempts[used]
    for name, ts in raw.items():
        timings[name] = sorted(ts)[len(ts) // 2]

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "graft_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_raw": raw,
        "reps": reps,
        "method": "interleaved_median",
        "sf": SF_DIR,
        "num_cpus": NCPUS,
        "synth_docs": SYNTH_DOCS,
        "synth_dup_pairs": int(n_pairs),
        "docs_per_sec_neardup": round(SYNTH_DOCS / timings["neardup_synth"], 1),
        "host_window": window,
        "steal_gate_pct": steal_gate,
        "attempts": len(attempts),
        "attempt_used": used,
        "attempt_windows": [w for _, w in attempts],
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """N vs 4N CPUs, fresh processes, same input (the sandbox stand-in
    for N- vs 4N-node clusters).  Default pair 2/8: both levels must be
    CPU-bound for the ratio to measure SOFTWARE scaling — at 8+ CPUs
    this single socket's DRAM bandwidth saturates first (per-task
    core-seconds inflate ~3x at 32 workers; node-emulation probe shows
    1.89x slowdown with zero shared software — BASELINE.md), a ceiling
    the real N-vs-4N-node comparison does not share (every node adds
    its own DRAM+NIC).  The 4/16 and 8/32 pairs are also measured and
    recorded in BASELINE.md every round."""
    import subprocess
    lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = 4 * lo

    def once(n):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_BENCH_SLIM="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    # INTERLEAVED median-of-3 per level: single-run variance on this
    # shared host reaches ±60% (noisy neighbors, page-cache state); the
    # lo/hi/lo/hi ordering exposes both levels to the same noise window
    # and the median rejects one bad (or one lucky) run per side.
    #
    # SESSION retry: a session where ANY rep ran under >5% hypervisor
    # steal systematically deflates measured efficiency (steal hits the
    # hi side harder — BASELINE.md's 13-session record).  Up to
    # GRAFT_SCALING_ATTEMPTS sessions run until one is all-reps-clean;
    # the cleanest session is reported, every session's windows are
    # kept in the artifact.
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    max_sessions = max(1, int(os.environ.get("GRAFT_SCALING_ATTEMPTS", "3")))
    gate = float(os.environ.get("GRAFT_BENCH_STEAL_GATE", "5.0"))
    # a session is "settled" when its clean reps also agree with each
    # other: round-4 session A was all-reps-clean (<5% steal) yet its
    # hi side spread 27.2-37.9 s — co-tenant DRAM traffic doesn't show
    # as steal.  Spread above this ratio triggers another session.
    max_spread = float(os.environ.get("GRAFT_SCALING_MAX_SPREAD", "1.25"))

    def _steals(runs):
        return [float((r.get("host_window") or {}).get("steal_pct", 0.0))
                for r in runs]

    def _clean_spread(runs):
        ts = [r["queries"]["neardup_synth"] for r in runs
              if (r.get("host_window") or {}).get("steal_pct", 0.0) <= gate]
        return (max(ts) / min(ts)) if ts else float("inf")

    def _wait_for_quiet(budget: float = 300.0) -> None:
        """Same wait-for-quiet as the bench suite: don't start a retry
        session inside the SAME dirty hypervisor window the failed one
        measured."""
        t_end = time.time() + budget
        while time.time() < t_end:
            st0, tot0 = _steal_jiffies()
            time.sleep(20)
            st1, tot1 = _steal_jiffies()
            if 100.0 * (st1 - st0) / max(tot1 - tot0, 1) < gate:
                return

    sessions = []
    for s_i in range(max_sessions):
        if s_i and sessions[-1][0] > gate:
            _wait_for_quiet()
        s_runs_lo, s_runs_hi = [], []
        for _ in range(reps):
            s_runs_lo.append(once(lo))
            s_runs_hi.append(once(hi))
        worst = max(_steals(s_runs_lo) + _steals(s_runs_hi))
        spread = max(_clean_spread(s_runs_lo), _clean_spread(s_runs_hi))
        sessions.append((worst, spread, s_runs_lo, s_runs_hi))
        if worst <= gate and spread <= max_spread:
            break
    # VALUE-BLIND selection (efficiency is never consulted): prefer
    # all-clean sessions, then the lowest clean-rep spread, then the
    # lowest worst-steal — every session's evidence stays in the
    # artifact below.
    worst_steal, spread_used, runs_lo, runs_hi = min(
        sessions, key=lambda s: (s[0] > gate, round(s[1], 3), s[0]))

    def med(runs):
        ts = sorted(r["queries"]["neardup_synth"] for r in runs)
        return ts[len(ts) // 2]

    t_lo, t_hi = med(runs_lo), med(runs_hi)
    docs = runs_lo[0]["synth_docs"]
    eff = (t_lo / t_hi) / (hi / lo)

    # steal-screened companion metric: hypervisor CPU steal only ever
    # ADDS wall time and (measured) hits the hi level harder — more
    # vCPUs busy draws proportionally more steal on a contended host.
    # Reps whose window exceeded the steal gate are excluded and the
    # surviving medians re-ratioed; per-rep steal is in the artifact so
    # the screen is auditable.  This does NOT replace the official
    # unscreened median — it quantifies how much of a low number is
    # attributable to documented external steal.
    STEAL_GATE_PCT = 5.0

    def _screened(runs):
        ok = [r["queries"]["neardup_synth"] for r in runs
              if (r.get("host_window") or {}).get("steal_pct", 0.0)
              <= STEAL_GATE_PCT]
        ts = sorted(ok)
        return (ts[len(ts) // 2], len(ts)) if ts else (None, 0)

    s_lo, n_slo = _screened(runs_lo)
    s_hi, n_shi = _screened(runs_hi)
    eff_screened = round((s_lo / s_hi) / (hi / lo), 3) \
        if s_lo and s_hi else None

    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": t_lo, "sec_hi": t_hi,
        "sec_lo_all": sorted(round(r["queries"]["neardup_synth"], 2)
                             for r in runs_lo),
        "sec_hi_all": sorted(round(r["queries"]["neardup_synth"], 2)
                             for r in runs_hi),
        # RUN-ORDER times: index-aligned with host_windows_lo/hi so the
        # steal↔time correlation is readable straight off the artifact
        "sec_lo_runs": [round(r["queries"]["neardup_synth"], 2)
                        for r in runs_lo],
        "sec_hi_runs": [round(r["queries"]["neardup_synth"], 2)
                        for r in runs_hi],
        "value_steal_screened": eff_screened,
        "steal_gate_pct": STEAL_GATE_PCT,
        "screened_reps": {"lo": n_slo, "hi": n_shi},
        "sessions_tried": len(sessions),
        "session_worst_steal_pct": round(worst_steal, 2),
        "session_clean_spread": (round(spread_used, 3)
                                 if spread_used != float("inf") else None),
        "max_spread_gate": max_spread,
        # per-session audit trail: (worst steal %, clean-rep spread,
        # per-side run times) for every session incl. unused ones
        "sessions": [{
            "worst_steal_pct": round(w, 2),
            "clean_spread": round(sp, 3) if sp != float("inf") else None,
            "sec_lo_runs": [round(r["queries"]["neardup_synth"], 2)
                            for r in rl],
            "sec_hi_runs": [round(r["queries"]["neardup_synth"], 2)
                            for r in rh],
        } for w, sp, rl, rh in sessions],
        "docs_per_sec_lo": round(docs / t_lo, 1),
        "docs_per_sec_hi": round(docs / t_hi, 1),
        "synth_docs": docs,
        # per-run host-noise evidence (calibration probe + CPU steal):
        # see _calibrate — lets a reader judge whether lo/hi samples
        # shared a comparable noise window
        "host_windows_lo": [r.get("host_window") for r in runs_lo],
        "host_windows_hi": [r.get("host_window") for r in runs_hi],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
