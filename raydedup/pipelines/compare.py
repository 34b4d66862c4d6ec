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
                   value_col: str = "jaccard") -> dict:
    """→ {matched, mismatched, missing, added, max_abs_diff, warnings}.

    missing = coordinates only in gold; added = only in test;
    mismatched = present in both with |gold − test| > tol
    (the fabs-tolerance compare of compareCoords.cpp:219).
    """
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

    def _cmp(tab: pa.Table | None) -> pa.Table:
        empty = pa.table({
            "matched": pa.array([0], pa.int64()),
            "mismatched": pa.array([0], pa.int64()),
            "missing": pa.array([0], pa.int64()),
            "added": pa.array([0], pa.int64()),
            "max_abs_diff": pa.array([0.0], pa.float64()),
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
        diffs = np.abs(v[paired] - v[np.flatnonzero(paired) + 1])
        mism = int((diffs > tol).sum())
        return pa.table({
            "matched": pa.array([int(paired.sum())], pa.int64()),
            "mismatched": pa.array([mism], pa.int64()),
            "missing": pa.array([int(gold_only.sum())], pa.int64()),
            "added": pa.array([int(test_only.sum())], pa.int64()),
            "max_abs_diff": pa.array(
                [float(diffs.max()) if len(diffs) else 0.0], pa.float64()),
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
    return out
