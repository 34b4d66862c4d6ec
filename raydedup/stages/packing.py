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
  2. counts are RANGE-partitioned on id.  Dense id spaces use fixed
     arithmetic ranges from the global min/max (two cheap aggregates);
     sparse/skewed id spaces use quantile cut points from a
     deterministic hash-sample of the ids (the driver holds only the
     sample and P-1 cut points).  The choice is automatic (span vs row
     count) and does NOT affect the output: bins derive from the global
     id-order cumsum, which any monotone range partition preserves;
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


def _sample_id_cuts(counts, id_col: str, n_parts: int, seed: int,
                    target: int = 65536) -> np.ndarray:
    """Quantile cut points for a RANGE partition over sparse/skewed ids:
    deterministic hash-sample of ~``target`` ids (splitmix64 threshold,
    partition-order independent), driver sorts the sample and takes P-1
    quantiles.  Any monotone cut set is CORRECT (bins come from the
    id-order cumsum); the sample only buys balance."""
    import ray

    from ..functions.hashing import splitmix64

    n = counts.count()
    frac = min(1.0, target / max(n, 1))
    cut = np.uint64(min(int(frac * (2**64 - 1)), 2**64 - 1))
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) & (2**64 - 1))

    def _pick(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        keep = splitmix64(ids.view(np.uint64) ^ salt) <= cut
        return pa.table({id_col: pa.array(ids[keep], pa.int64())})

    tabs = [t for t in ray.get(
        counts.map_batches(_pick, batch_format="pyarrow")
              .to_arrow_refs()) if len(t)]
    if not tabs:
        return np.empty(0, dtype=np.int64)
    sample = np.sort(np.concatenate(
        [np.asarray(t[id_col], dtype=np.int64) for t in tabs]))
    qs = (np.arange(1, n_parts) * len(sample)) // n_parts
    return np.unique(sample[qs])


def pack_sequences(docs, cfg: PipelineConfig = DEFAULT_CONFIG, *,
                   budget: int, id_col: str = "doc_id",
                   text_col: str = "text",
                   partitioner: str = "auto"):
    """→ Dataset(id_col, n_tokens, bin): contiguous token-budget bins
    in ascending id order (see module docstring for the plan).

    ``partitioner``: "arith" (fixed ranges over [min, max] — right for
    dense ids), "quantile" (hash-sampled cut points — right for sparse/
    skewed ids where arithmetic ranges would put everything in a few
    partitions), or "auto" (quantile when the id span is ≫ the row
    count).  The OUTPUT is identical either way; only partition balance
    differs."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if partitioner not in ("auto", "arith", "quantile"):
        raise ValueError(f"unknown partitioner {partitioner!r}")
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
    if partitioner == "auto":
        partitioner = ("quantile" if span > 8 * max(counts.count(), 1)
                       else "arith")

    if partitioner == "quantile":
        cuts = _sample_id_cuts(counts, id_col, n_parts, cfg.seed)

        def _part_of(ids: np.ndarray) -> np.ndarray:
            return np.searchsorted(cuts, ids, side="right").astype(np.int64)
    else:
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
