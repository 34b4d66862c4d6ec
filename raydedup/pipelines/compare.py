"""Golden-output comparator — the compareCoords tool reborn.

The reference ships ``compareCoords <gold> <test> <tol>``: an ordered
merge of two scored edge files reporting per-element mismatches beyond a
float tolerance plus missing/added coordinates, with exit code = the
warning count (compareCoords.cpp:174-320).  Here: a full outer join on
the coordinate key (partitioned hash join over our manual shuffle),
tolerance compare on the value column, and a summary dict; the CLI exit
code is min(warnings, 125) to mirror the reference's contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import splitmix64
from ..functions.shuffle import hash_partition_map


def compare_scores(gold_ds, test_ds, tol: float = 1e-6,
                   cfg: PipelineConfig = DEFAULT_CONFIG,
                   keys: tuple[str, str] = ("a", "b"),
                   value_col: str = "jaccard",
                   max_samples: int = 10) -> dict:
    """→ {matched, mismatched, missing, added, max_abs_diff, warnings,
         samples}.

    missing = coordinates only in gold; added = only in test;
    mismatched = present in both with |gold − test| > tol
    (the fabs-tolerance compare of compareCoords.cpp:219).

    ``samples``: up to ``max_samples`` offending coordinates as
    {kind, a, b, gold, test} dicts (deterministic: smallest keys first)
    — the analogue of the reference's per-element mismatch printout
    (compareCoords.cpp:230-276), so a failing compare is localizable
    without rerunning."""
    ka, kb = keys
    n_parts = cfg.resolved_partitions()

    def _tag(side):
        def _f(t: pa.Table) -> pa.Table:
            a = np.asarray(t[ka], dtype=np.int64)
            b = np.asarray(t[kb], dtype=np.int64)
            part = (splitmix64(a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                               ^ b.view(np.uint64))
                    % np.uint64(n_parts)).astype(np.int64)
            return pa.table({
                ka: pa.array(a, pa.int64()),
                kb: pa.array(b, pa.int64()),
                "val": t[value_col].cast(pa.float64()),
                "side": pa.array(np.full(len(t), side, dtype=np.int8), pa.int8()),
                "part": pa.array(part, pa.int64()),
            })
        return _f

    both = gold_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        test_ds.map_batches(_tag(1), batch_format="pyarrow"))

    def _samples_cols(kind=None, aa=None, bb=None, gold=None, test=None):
        mk = lambda vals, ty: pa.array([list(vals)] if vals is not None
                                       else [[]], pa.list_(ty))
        return {
            "s_kind": mk(kind, pa.string()), "s_a": mk(aa, pa.int64()),
            "s_b": mk(bb, pa.int64()), "s_gold": mk(gold, pa.float64()),
            "s_test": mk(test, pa.float64()),
        }

    def _cmp(tab: pa.Table | None) -> pa.Table:
        empty = pa.table({
            "matched": pa.array([0], pa.int64()),
            "mismatched": pa.array([0], pa.int64()),
            "missing": pa.array([0], pa.int64()),
            "added": pa.array([0], pa.int64()),
            "max_abs_diff": pa.array([0.0], pa.float64()),
            **_samples_cols(),
        })
        if tab is None or len(tab) == 0:
            return empty
        a = np.asarray(tab[ka], dtype=np.int64)
        b = np.asarray(tab[kb], dtype=np.int64)
        v = np.asarray(tab["val"], dtype=np.float64)
        s = np.asarray(tab["side"], dtype=np.int8)
        # merge the two sorted-by-key streams: lexsort by (a, b, side)
        order = np.lexsort((s, b, a))
        a, b, v, s = a[order], b[order], v[order], s[order]
        same_next = np.zeros(len(a), dtype=bool)
        if len(a) > 1:
            same_next[:-1] = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
        paired = same_next & (s == 0)           # gold row followed by test row
        gold_only = (s == 0) & ~paired
        test_only = (s == 1)
        test_only[np.flatnonzero(paired) + 1] = False
        pidx = np.flatnonzero(paired)
        diffs = np.abs(v[pidx] - v[pidx + 1])
        bad = diffs > tol
        mism = int(bad.sum())
        # offending-row samples (per-partition cap; rows are already
        # key-sorted, so taking the head is deterministic)
        nan = float("nan")
        s_kind, s_a, s_b, s_gold, s_test = [], [], [], [], []
        for i in pidx[bad][:max_samples]:
            s_kind.append("mismatch"); s_a.append(int(a[i])); s_b.append(int(b[i]))
            s_gold.append(float(v[i])); s_test.append(float(v[i + 1]))
        for i in np.flatnonzero(gold_only)[:max_samples]:
            s_kind.append("missing"); s_a.append(int(a[i])); s_b.append(int(b[i]))
            s_gold.append(float(v[i])); s_test.append(nan)
        for i in np.flatnonzero(test_only)[:max_samples]:
            s_kind.append("added"); s_a.append(int(a[i])); s_b.append(int(b[i]))
            s_gold.append(nan); s_test.append(float(v[i]))
        return pa.table({
            "matched": pa.array([int(paired.sum())], pa.int64()),
            "mismatched": pa.array([mism], pa.int64()),
            "missing": pa.array([int(gold_only.sum())], pa.int64()),
            "added": pa.array([int(test_only.sum())], pa.int64()),
            "max_abs_diff": pa.array(
                [float(diffs.max()) if len(diffs) else 0.0], pa.float64()),
            **_samples_cols(s_kind, s_a, s_b, s_gold, s_test),
        })

    parts = hash_partition_map(both, "part", _cmp, n_parts).to_pandas()
    out = {
        "matched": int(parts["matched"].sum()),
        "mismatched": int(parts["mismatched"].sum()),
        "missing": int(parts["missing"].sum()),
        "added": int(parts["added"].sum()),
        "max_abs_diff": float(parts["max_abs_diff"].max()) if len(parts) else 0.0,
        "tol": tol,
    }
    out["warnings"] = out["mismatched"] + out["missing"] + out["added"]
    samples = []
    for _, row in parts.iterrows():
        samples.extend(
            {"kind": k, "a": int(aa), "b": int(bb),
             "gold": None if np.isnan(g) else float(g),
             "test": None if np.isnan(t) else float(t)}
            for k, aa, bb, g, t in zip(row["s_kind"], row["s_a"], row["s_b"],
                                       row["s_gold"], row["s_test"]))
    samples.sort(key=lambda s: (s["a"], s["b"], s["kind"]))
    out["samples"] = samples[:max_samples]
    return out
