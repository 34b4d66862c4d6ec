"""Sequence packing: assign docs to fixed-token-budget bins.

``pack_sequences`` gives every doc a ``bin`` id such that docs are
packed contiguously in ascending ``id_col`` order and each bin holds
``budget`` tokens (a doc straddling a boundary belongs to the bin its
running total starts in) — the deterministic sequence-packing layout a
training run uses to batch documents into fixed-length contexts.

Physical plan — a distributed two-phase prefix sum (the same
prefix-sum shape as the reference's weighted RowSum accumulation,
jaccard.cpp RowSum/prefix patterns, recast across partitions):

  1. one streaming map computes per-doc token counts (16 bytes/doc —
     the text never travels further);
  2. counts are RANGE-partitioned on id (fixed arithmetic ranges from
     the global min/max id — two cheap aggregates; a production build
     over sparse ids would sample quantile cut points instead, same
     plan shape);
  3. per-partition token totals (one tiny groupby) are exclusive-
     scanned on the DRIVER — P values, not rows — and broadcast;
  4. one exchange sorts each partition by id, adds its partition's
     offset to the local exclusive cumsum, and emits
     ``bin = global_exclusive_cumsum // budget``.

Every bin except possibly the last is "full" (its last doc crosses the
budget boundary); bins never interleave ids, so downstream shard
writers can stream bins in order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.shuffle import hash_partition_map


def pack_sequences(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   budget: int, id_col: str = "doc_id",
                   text_col: str = "text"):
    """→ Dataset(id_col, n_tokens, bin): contiguous token-budget bins
    in ascending id order (see module docstring for the plan)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_parts = cfg.resolved_partitions()

    def _count(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t[text_col], ""), " "))
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "n_tokens": n.cast(pa.int64())})

    counts = docs.map_batches(_count, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    lo = counts.min(id_col)
    hi = counts.max(id_col)
    span = max(hi - lo + 1, 1)

    def _part_of(ids: np.ndarray) -> np.ndarray:
        return ((ids - lo) * n_parts // span).astype(np.int64)

    def _tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        return t.append_column("part", pa.array(_part_of(ids), pa.int64()))

    tagged = counts.map_batches(_tag, batch_format="pyarrow",
                                zero_copy_batch=True)

    # per-partition totals → driver-side exclusive scan (P values)
    totals = np.zeros(n_parts, dtype=np.int64)
    tot_tab = (tagged.groupby("part").sum("n_tokens")).to_pandas()
    totals[tot_tab["part"].to_numpy()] = tot_tab["sum(n_tokens)"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def _bins(tab: pa.Table | None) -> pa.Table:
        if tab is None or len(tab) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "bin": pa.array([], pa.int64())})
        ids = np.asarray(tab[id_col], dtype=np.int64)
        ntok = np.asarray(tab["n_tokens"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        excl = np.concatenate(([0], np.cumsum(ntok)[:-1]))
        excl += offsets[int(_part_of(ids[:1])[0])]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ntok, pa.int64()),
                         "bin": pa.array(excl // budget, pa.int64())})

    return hash_partition_map(tagged, "part", _bins, n_parts)
