"""Exact-Jaccard re-verification of candidate pairs.

The reference's pair-list API (``jaccard_list`` /
``Jaccard_IsPairsKernel``, jaccard.cpp:462-605, 901-923) scores an
explicit (first[], second[]) pair list by gathering both adjacency rows
and intersecting them.  Here the "gather" is two hash-partitioned joins
(pair.a → shingles, pair.b → shingles; shuffle key = doc_id) and the
"intersect" is the batched merge-count kernel
(functions/setops.py) — pure vectorized map, no atomics (SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.setops import pairwise_jaccard
from ..functions.text import binary_to_sets


def attach_sets(pairs_ds, sig_ds, cfg: PipelineConfig, id_col: str = "doc_id",
                set_col: str = "shingles"):
    """pairs(a,b) ⋈ sets on a, then on b → (a, b, set_a, set_b)."""
    side = sig_ds.select_columns([id_col, set_col])
    a_side = side.rename_columns({id_col: "a", set_col: "set_a"})
    b_side = side.rename_columns({id_col: "b", set_col: "set_b"})
    out = pairs_ds.join(a_side, join_type="inner",
                        num_partitions=cfg.num_partitions, on=("a",))
    out = out.join(b_side, join_type="inner",
                   num_partitions=cfg.num_partitions, on=("b",))
    return out


def score_pairs(joined_ds, cfg: PipelineConfig | None = None,
                threshold: float | None = ...):
    """(a, b, set_a, set_b) → (a, b, intersection, union, jaccard),
    filtered to jaccard ≥ threshold.  ``threshold=...`` (default) takes
    cfg.verify_threshold; ``threshold=None`` disables the filter."""
    if threshold is ...:
        thr = cfg.verify_threshold if cfg is not None else None
    else:
        thr = threshold

    def _score(batch: pa.Table) -> pa.Table:
        av, ao = binary_to_sets(batch["set_a"])
        bv, bo = binary_to_sets(batch["set_b"])
        inter, union, j = pairwise_jaccard(av, ao, bv, bo)
        out = pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "intersection": pa.array(inter, type=pa.int64()),
            "union": pa.array(union, type=pa.int64()),
            "jaccard": pa.array(j, type=pa.float64()),
        })
        if thr is not None:
            out = out.filter(pc.greater_equal(out["jaccard"], pa.scalar(thr)))
        return out

    return joined_ds.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)


def verify_pairs(pairs_ds, sig_ds, cfg: PipelineConfig,
                 threshold: float | None = ..., id_col: str = "doc_id",
                 set_col: str = "shingles"):
    """Full verification: join shingle sets onto pairs, score, filter."""
    joined = attach_sets(pairs_ds, sig_ds, cfg, id_col=id_col, set_col=set_col)
    return score_pairs(joined, cfg, threshold=threshold)
